"""Caption-decode serving throughput on TPU.

Measures `serve.InferenceEngine.caption` (KV-cached greedy `lax.scan`
decode, and beam search) at the production decoder size
(`model/text/transformer_decoder.yaml`: 12 layers, width 512, 32 decode
steps, cross-attention into the ViT-B audio tower's features). The
decode loop is one jitted scan, so the remote tunnel sees a single
dispatch per batch. Usage: python experiments/caption_bench.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    from vipant_tpu.serve import InferenceEngine

    B = int(os.environ.get("CAP_B", "64"))
    eng = InferenceEngine(
        [
            "+running=bimodal",
            "+model/image=vit_val",
            "+model/audio=vit_val",
            "+model/text=transformer_decoder",
            "+model/loss=ce_lm",
            "+optimizer=standard",
            "+running/audio=default",
            "model.audio.pre_encoder.stride=[16,24]",
            "running.retrieval=False",
            "worker=CLAP",
            "model_file=",
            "eval=True",
        ],
        batch_size=B,
    )
    rng = np.random.default_rng(0)
    fb = rng.standard_normal((B, 1000, 128)).astype(np.float32)
    max_dec = int(eng.cfg.model.text.get("max_len_dec", 32))

    for label, beam in (("greedy", 0), ("beam=3", 3)):
        caps = eng.caption(fb, beam=beam)  # warm (compile)
        assert len(caps) == B
        t0 = time.perf_counter()
        n = 3
        for _ in range(n):
            caps = eng.caption(fb, beam=beam)
        dt = (time.perf_counter() - t0) / n
        print(
            f"caption[{label}] B={B}: {dt*1e3:7.1f} ms -> "
            f"{B/dt:7.1f} clips/s, {B*max_dec/dt:8.0f} tok/s "
            f"(decoder 12x512, {max_dec} steps)",
            flush=True,
        )


if __name__ == "__main__":
    main()
