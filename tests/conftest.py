"""Test bootstrap: force an 8-device virtual CPU mesh before jax is imported.

This is the JAX-native analogue of a fake multi-device backend (the reference
had none; SURVEY.md §4): all sharding/collective tests run against
``xla_force_host_platform_device_count=8``.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"  # the ambient env may point at a TPU

# A sitecustomize may pre-import jax at interpreter startup, freezing the
# jax_platforms config default before the env var above takes effect; the
# explicit config update wins as long as no backend has initialized yet.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# ---------------------------------------------------------------------------
# Two-tier suite: `pytest -m "not slow"` is the fast tier (~5 min on the
# 1-CPU box, covers every subsystem); the full suite adds the compile-heavy
# 8-device shard_maps, multi-process spawns, CLI subprocesses and the
# learning-verification overfit runs (20-40 min). The list below centrally
# marks tests measured >= ~11 s on the reference box (full `--durations`
# run, round 4); "*" marks a whole file. Parametrized tests match on the
# base name.
# ---------------------------------------------------------------------------
SLOW_TESTS = {
    "test_graft_entry.py": "*",  # also file-marked; kept for completeness
    "test_multiprocess.py": "*",
    "test_cli_checkpoint_parity.py": "*",
    "test_pipeline.py": (
        "test_pipelined_cvap_step_matches_plain",
        "test_stacked_remat_matches_unrolled",
        "test_pipelined_trainer_train_save_resume",
        "test_grad_cache_composes_with_pipeline",
        "test_stacked_transformer_matches_unrolled",
        "test_token_pack_composes_with_pipeline",
        "test_gpipe_exact_fwd_and_grad",
    ),
    "test_sequence_parallel.py": ("test_stacked_trunk_seq_parallel_matches_sequential",),
    "test_three_axis.py": "*",
    "test_towers.py": (
        "test_siamese_tying",
        "test_resnet_tower",
        "test_text_token_pack_exact",
        "test_token_pack_exact_and_fallback",
    ),
    "test_zero.py": (
        "test_zero_trainer_knob",
        "test_zero_checkpoint_roundtrip",
        "test_zero_step_matches_replicated",
    ),
    "test_on_device_frontend.py": (
        "test_va_trainer_on_device_end_to_end",
        "test_va_trainer_int16_uint8_end_to_end",
    ),
    "test_captioning.py": (
        "test_clap_captioning_train_and_decode",
        "test_beam_decode",
        "test_kv_cache_decode_matches_full_reforward",
    ),
    "test_reference_export.py": (
        "test_trainer_export_pth_cli_flag",
        "test_export_roundtrip_two_tuple",
    ),
    "test_parallel.py": ("test_sharded_train_step_matches_single_device",),
    "test_fused_attn.py": (
        "test_fused_block_shape_sweep",
        "test_fused_ln_block_tensor_parallel_matches_single",
        "test_fused_block_tensor_parallel_matches_single",
    ),
    "test_resnet_port.py": ("test_resnet_tower_parity",),
    "test_trainers.py": ("test_mid_epoch_exact_resume",),
    "test_aux_features.py": (
        "test_la_encode_text_dump_and_manifest_eval",
        "test_va_infer_with_gold_file",
        "test_save_cadence_independent_of_peep_and_warmup_force_eval",
    ),
    "test_grad_cache_trainer.py": (
        "test_va_grad_cache_with_uint8_and_on_device_audio",
        "test_grad_cache_step_equals_plain_step",
        "test_la_trainer_with_grad_cache",
    ),
    "test_quant.py": ("test_int8_frozen_tower_forward_and_grads",),
    "test_serve.py": ("test_frame_emb_passthrough_train_step",),
    "test_deit.py": ("test_deit_audio_trainer_e2e", "test_legacy_group_aliases_compose"),
    "test_init_scheme.py": ("test_clip_init_stds",),
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        names = SLOW_TESTS.get(item.fspath.basename, ())
        if names == "*" or item.name.split("[")[0] in names:
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
