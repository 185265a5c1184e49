"""Worker process for the multi-host end-to-end PIPELINE test.

Launched by tests/test_multihost.py: N of these form a jax.distributed
cluster over localhost and run the FULL distributed pipeline
(pipeline._run_pipeline_distributed) on a shared working directory —
read-sharded mapping with host-0 SAM merge, sharded realign, mesh EM,
host-sharded analyses, host-0 meta-analyses.  The product analogue of
the reference's jobTree-over-gridEngine placement (Makefile:2).

Usage: python multihost_pipeline_worker.py <proc_id> <nprocs> <port> \
        <working_dir> <out_json>
"""

import json
import os
import sys


def main() -> int:
    proc_id, nprocs, port, working_dir, out_path = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4],
        sys.argv[5],
    )
    import jax

    jax.distributed.initialize(
        coordinator_address="localhost:%s" % port,
        num_processes=nprocs,
        process_id=proc_id,
    )
    assert jax.process_count() == nprocs

    from nanopore_tpu.align.em import EmOptions
    from nanopore_tpu.pipeline import run_pipeline, PipelineConfig

    config = PipelineConfig(
        mappers=["LastParamsChain", "LastParamsRealignEm"],
        analyses=["GlobalCoverage", "Substitutions"],
        meta_analyses=["CoverageSummary"],
        max_workers=2,
        em_options=EmOptions(trials=2, iterations=3, band_width=48),
    )
    out = run_pipeline(working_dir, config)

    base = os.path.join(out, "analysis_2d")
    exps = sorted(os.listdir(base))
    sams = {}
    for exp in exps:
        sam = os.path.join(base, exp, "mapping.sam")
        with open(sam) as fh:
            sams[exp] = fh.read()
    with open(out_path, "w") as fh:
        json.dump(
            {
                "process": proc_id,
                "experiments": exps,
                "sam_sizes": {k: len(v) for k, v in sams.items()},
                "output_dir": out,
            },
            fh,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
