"""Profile the flagship CVAP train step on the real TPU and print a
per-op-category self-time breakdown (parsed from the xplane proto).

Usage: python experiments/profile_step.py [batch]
"""

from __future__ import annotations

import glob
import os
import sys
from collections import defaultdict

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

import jax
import jax.numpy as jnp
import numpy as np


def build_step(B):
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from vipant_tpu.config import compose
    from vipant_tpu.models import build_main_model, init_model, tunable_mask
    from vipant_tpu.optim import build_optimizer
    from vipant_tpu.optim.partition import partition_params
    from vipant_tpu.train import TrainState, make_train_step

    cfg = compose([
        "+running=bimodal", "+model/image=vit_val", "+model/audio=vit_val",
        "+model/text=dummy", "+model/loss=ce", "+optimizer=standard",
        "+running/audio=default", "model.audio.pre_encoder.stride=[16,24]",
        "worker=CVAP", f"running.batch_size={B}",
    ])
    model = build_main_model(cfg)
    variables = init_model(cfg, model)
    mask = tunable_mask(cfg, variables["params"])
    trainable, frozen = partition_params(variables["params"], mask)
    tx, _ = build_optimizer(cfg.optimizer, steps_per_epoch=1000)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((B, 3, 224, 224)), jnp.float32)
    audios = jnp.asarray(rng.standard_normal((B, 1, 1000, 128)), jnp.float32)
    step = make_train_step(model, tx, donate=False)
    state = TrainState.create(trainable, tx, frozen_params=frozen)
    return step, state, images, audios


def parse_xplane(logdir):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    assert paths, f"no xplane under {logdir}"
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(sorted(paths)[-1], "rb").read())
    rows = []
    for plane in xs.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        ev_meta = plane.event_metadata
        for line in plane.lines:
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name
                if not name.startswith("%"):
                    continue  # leaf XLA ops only (skip module/step envelopes)
                rows.append((name, ev.duration_ps / 1e9))  # ms
    return rows


CATS = [
    ("attention-kernel", lambda n: "attend" in n or "flash" in n or "custom-call" in n),
    ("copy", lambda n: "copy" in n),
    ("slice", lambda n: "slice" in n),
    ("transpose", lambda n: "transpose" in n),
    ("convert", lambda n: "convert" in n),
    ("fusion(matmul)", lambda n: ("dot" in n or "conv" in n) ),
    ("reduce", lambda n: "reduce" in n),
    ("fusion(other)", lambda n: "fusion" in n),
]


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    os.makedirs("/tmp/jaxcache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    step, state, images, audios = build_step(B)
    state, m = step(state, images, audios)
    float(m["loss"])
    state, m = step(state, images, audios)
    float(m["loss"])

    logdir = "/tmp/vipant_profile"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        for _ in range(3):
            state, m = step(state, images, audios)
        float(m["loss"])

    rows = parse_xplane(logdir)
    by_name = defaultdict(float)
    for name, ms in rows:
        by_name[name] += ms
    total = sum(by_name.values())
    by_cat = defaultdict(float)
    for name, ms in by_name.items():
        low = name.lower()
        for cat, pred in CATS:
            if pred(low):
                by_cat[cat] += ms
                break
        else:
            by_cat["other"] += ms
    print(f"total device time {total:.1f} ms over 3 steps -> {total/3:.1f} ms/step")
    for cat, ms in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:20s} {ms/3:8.2f} ms/step  {100*ms/total:5.1f}%")
    print("top 25 ops:")
    for name, ms in sorted(by_name.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {ms/3:8.3f} ms/step  {name[:110]}")


if __name__ == "__main__":
    main()
