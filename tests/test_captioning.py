"""CLAP captioning branch: SeqGenerationHead training + greedy decode."""

import numpy as np
import pytest

from vipant_tpu.config import compose
from vipant_tpu.train import build_monitor
from data_synth import make_synth_clotho

from test_trainers import TINY_MODEL


def caption_cfg(tmp_path):
    return compose([
        "+running=clotho",
        *TINY_MODEL,
        "+model/text=transformer_decoder",
        "+model/loss=ce_lm",
        "worker=CLAP",
        "monitor=LAMonitor",
        # decoder geometry for the tiny model
        "model.text.width=32",
        "model.text.heads=4",
        "model.text.layers=2",
        "model.text.mem_width=64",
        "model.text.max_len_dec=8",
        "model.text.embed_dim=32",
        f"running.data_root={tmp_path}",
        "running.data_name=clotho_dev",
        "running.eval_name=clotho_dev",
        "running.test_name=",
        "running.retrieval=False",
        "running.batch_size=2",
        "running.epochs=1",
        "running.peep_rate=1",
        "running.save_rate=1000000",
        "running.save_epoch=False",
        "running.eval_samples=4",
        f"alias_root={tmp_path}/run",
        f"model_root={tmp_path}/run",
        "model_file=",
        "eval=False",
    ])


class _CaptionTrainerAdapter:
    pass


def test_clap_captioning_train_and_decode(tmp_path):
    make_synth_clotho(str(tmp_path), "clotho_dev", n=4, seconds=1.05)
    cfg = caption_cfg(tmp_path)
    mon = build_monitor(cfg)

    # override the loss adapter for the captioning branch
    import jax

    from vipant_tpu.train import make_train_step

    def adapter(model, variables, batch, rngs):
        return model.apply(variables, *batch, retrieval=False, train=True, rngs=rngs)

    mon.train_step = make_train_step(mon.model, mon.tx, loss_adapter=adapter, donate=True)
    mon.epoch(0)  # one epoch of LM training must run

    captions = mon.decode_captions(mon.evalloader, max_batches=1)
    assert len(captions) >= 1
    assert all(isinstance(c, str) for c in captions)
