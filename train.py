#!/usr/bin/env python
"""CLI launcher.

Usage mirrors the reference's hydra grammar
(`/root/reference/train.py` + `/root/reference/bash/run_bimodal_va.sh`):

    python train.py +running=bimodal +model/image=vit_val +model/audio=vit_val \
        +model/text=dummy +model/loss=ce +optimizer=standard +running/audio=default \
        worker=CVAP monitor=VAMonitor running.batch_size=432 eval=False

Single SPMD program: on multi-host topologies set COORDINATOR_ADDRESS /
NUM_PROCESSES / PROCESS_ID env vars (replaces the reference's mp.spawn +
NCCL TCP rendezvous, `/root/reference/train.py:17-35`).
"""

from __future__ import annotations

import os
import sys


def main(argv=None) -> None:
    argv = list(sys.argv[1:] if argv is None else argv)

    from vipant_tpu.config import compose

    cfg = compose(argv)

    if cfg.get("platform"):
        os.environ["JAX_PLATFORMS"] = str(cfg.platform)

    import jax

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from vipant_tpu.parallel import distributed_init

    num_proc = int(os.environ.get("NUM_PROCESSES", "1"))
    if num_proc > 1:
        distributed_init(
            coordinator_address=os.environ.get("COORDINATOR_ADDRESS"),
            num_processes=num_proc,
            process_id=int(os.environ.get("PROCESS_ID", "0")),
        )

    if bool(cfg.get("blockprint", False)):  # stdout blackhole
        # devnull, not StringIO: the console logging handler binds this
        # stream, and an in-memory buffer would grow without bound over a
        # long run (parity: `/root/reference/train.py:50-52`)
        sys.stdout = open(os.devnull, "w")

    from vipant_tpu.train import build_monitor

    monitor = build_monitor(cfg)
    monitor.learn()


if __name__ == "__main__":
    main()
