"""InferenceEngine: batched fixed-shape encoders, reference-.pth loading,
multi-prompt zero-shot, and the CLI surface — the packaged equivalent of the
reference's ad-hoc embedding-dump / zero-shot monitor scripts
(`/root/reference/cvap/monitor/audioset_clf.py:70-98`,
`/root/reference/cvap/monitor/esc50_clf.py:294-325`)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from vipant_tpu.serve import InferenceEngine  # noqa: E402

TINY = [
    "+running=clotho",
    "+model/image=vit_val",
    "+model/audio=vit_val",
    "+model/text=transformer_val",
    "+model/loss=ce",
    "+optimizer=standard",
    "+running/audio=default",
    "worker=CLAP",
    "model.image.width=64",
    "model.image.embed_dim=32",
    "model.image.encoder.layers=2",
    "model.image.heads=4",
    "model.text.width=64",
    "model.text.embed_dim=32",
    "model.text.encoder.layers=2",
    "model.text.heads=4",
    "running.audio.max_len=100",
    "model_file=",
    "eval=True",
]


@pytest.fixture(scope="module")
def engine():
    return InferenceEngine(TINY, batch_size=4)


def test_embed_audio_batching_and_norm(engine):
    rng = np.random.default_rng(0)
    fb = rng.standard_normal((6, 100, 128)).astype(np.float32)  # 6 = 4 + ragged 2
    emb = engine.embed_audio(fb)
    assert emb.shape == (6, 32)
    # bf16 compute: unit norm to ~0.5%
    np.testing.assert_allclose(np.linalg.norm(emb, axis=-1), 1.0, rtol=1e-2)
    # padding must not leak into real rows: same inputs, different chunking
    emb2 = engine.embed_audio(fb[:5])
    np.testing.assert_allclose(emb[:5], emb2, rtol=1e-4, atol=1e-5)


def test_embed_texts_and_zero_shot(engine):
    t = engine.embed_texts(["a dog barking", "heavy rain"], prompt="the sound of ")
    assert t.shape == (2, 32)
    rng = np.random.default_rng(1)
    fb = rng.standard_normal((3, 100, 128)).astype(np.float32)
    res = engine.zero_shot(
        fb, {"dog": ["the sound of a dog", "a dog barking"], "rain": ["rain falling"]}
    )
    assert res["scores"].shape == (3, 2)
    assert set(res["prediction"]) <= {"dog", "rain"}
    np.testing.assert_allclose(res["probs"].sum(axis=1), 1.0, rtol=1e-5)


def test_engine_loads_reference_pth(tmp_path, engine):
    """Export the engine's own towers as a reference .pth; a fresh engine
    pointed at it must reproduce identical embeddings (not random init)."""
    from vipant_tpu.ckpt.reference_export import export_reference_pth

    params = engine.variables["params"]
    path = str(tmp_path / "model.pth")
    export_reference_pth(
        path,
        {"audio": params["audio"], "text": params["text"], "image": None,
         "loss": {"logit_scale": np.float32(1.0)}},
    )
    eng2 = InferenceEngine(TINY[:-2] + [f"model_file={path}", "eval=True"], batch_size=4)
    rng = np.random.default_rng(2)
    fb = rng.standard_normal((2, 100, 128)).astype(np.float32)
    np.testing.assert_allclose(
        engine.embed_audio(fb), eng2.embed_audio(fb), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        engine.embed_texts(["rain"]), eng2.embed_texts(["rain"]), rtol=1e-4, atol=1e-5
    )


def test_engine_loads_native_weight_export(tmp_path, engine):
    """A native checkpoint dir's model.npz (the weight-only export written
    beside every Orbax state) must load into the engine."""
    from vipant_tpu.ckpt.orbax_io import _flatten

    params = engine.variables["params"]
    step_dir = tmp_path / "run" / "00000005"
    os.makedirs(step_dir)
    np.savez(
        str(step_dir / "model.npz"),
        **{k: v for k, v in _flatten("", {"audio": params["audio"], "text": params["text"]})},
    )
    eng2 = InferenceEngine(
        TINY[:-2]
        + [f"model_root={tmp_path}", "model_name=run", "model_file=00000005", "eval=True"],
        batch_size=4,
    )
    rng = np.random.default_rng(3)
    fb = rng.standard_normal((2, 100, 128)).astype(np.float32)
    np.testing.assert_allclose(
        engine.embed_audio(fb), eng2.embed_audio(fb), rtol=1e-4, atol=1e-5
    )


def test_embed_image_files_cli(tmp_path):
    """embed_image CLI: jpgs through CLIP preprocessing to embeddings.
    Uses a CVAP config (image+audio towers)."""
    from data_synth import make_synth_va_index

    from vipant_tpu.serve import main

    make_synth_va_index(str(tmp_path), "train", n=2, seconds=0.3)
    out = str(tmp_path / "img.npz")
    cfg = [o for o in TINY if not o.startswith(("worker", "+model/text", "model.text"))]
    rc = main([
        "--task", "embed_image",
        "--inputs", os.path.join(str(tmp_path), "frame", "*.jpg"),
        "--output", out,
        "--batch_size", "2",
        "--",
    ] + cfg + ["+model/text=dummy", "worker=CVAP"])
    assert rc == 0
    z = np.load(out)
    assert z["embeddings"].shape == (2, 32)
    # plain-NumPy-readable floats (bf16 npz dumps need ml_dtypes to load)
    assert z["embeddings"].dtype == np.float32


def test_caption_task(tmp_path):
    """caption task: wavs through the CLAP decoder, greedy and beam."""
    from data_synth import make_synth_clotho

    make_synth_clotho(str(tmp_path), "clotho_dev", n=2, seconds=1.05)
    cfg = [
        o for o in TINY if not o.startswith(("+model/text", "+model/loss"))
    ] + [
        "+model/text=transformer_decoder",
        "+model/loss=ce_lm",
        "running.retrieval=False",
        "model.text.width=32",
        "model.text.heads=4",
        "model.text.layers=2",
        "model.text.mem_width=64",
        "model.text.max_len_dec=6",
        "model.text.embed_dim=32",
    ]
    eng = InferenceEngine(cfg, batch_size=2)
    wavs = sorted(
        os.path.join(str(tmp_path), "clotho_dev", "aclip", f)
        for f in os.listdir(os.path.join(str(tmp_path), "clotho_dev", "aclip"))
    )
    caps = eng.caption_files(wavs)
    assert len(caps) == len(wavs) and all(isinstance(c, str) for c in caps)
    caps_beam = eng.caption_files(wavs, beam=3)
    assert len(caps_beam) == len(wavs)


def test_serve_cli_zero_shot(tmp_path):
    from data_synth import make_synth_esc50

    from vipant_tpu.serve import main

    root = str(tmp_path)
    make_synth_esc50(root, "esc50", n_per_class=1, classes=("dog", "rain"), seconds=1.05)
    out = str(tmp_path / "zs.npz")
    rc = main([
        "--task", "zero_shot",
        "--inputs", os.path.join(root, "audio", "*.wav"),
        "--labels", "dog;rain",
        "--output", out,
        "--batch_size", "2",
        "--",
    ] + TINY)
    assert rc == 0
    z = np.load(out)
    assert z["scores"].shape[1] == 2 and len(z["prediction"]) == z["scores"].shape[0]


def test_empty_batch_returns_empty(engine):
    out = engine.embed_texts([])
    assert out.shape == (0, 32)


def test_partial_export_without_clip_fails_loudly(tmp_path, engine):
    """A weight export covering only some towers must not silently serve
    the uncovered towers at random init (unit-norm garbage): without CLIP
    weights to seed them, the engine refuses."""
    from vipant_tpu.ckpt.orbax_io import _flatten

    params = engine.variables["params"]
    step_dir = tmp_path / "run" / "00000007"
    os.makedirs(step_dir)
    np.savez(
        str(step_dir / "model.npz"),
        **{k: v for k, v in _flatten("", {"audio": params["audio"]})},
    )
    with pytest.raises(ValueError, match="random init"):
        InferenceEngine(
            TINY[:-2]
            + [
                f"model_root={tmp_path}",
                "model_name=run",
                "model_file=00000007",
                "eval=True",
            ],
            batch_size=4,
        )


def test_empty_batch_without_image_tower():
    """Audio-text configs (no image group) must still produce [0, D]
    empty results instead of crashing on cfg.model.image."""
    eng = InferenceEngine(
        [
            "+running=clotho",
            "+model/image=dummy",
            "+model/audio=vit_val",
            "+model/text=transformer_val",
            "+model/loss=ce",
            "+optimizer=standard",
            "+running/audio=default",
            "worker=CLAP",
            "model.audio.width=64",
            "model.audio.embed_dim=32",
            "model.audio.encoder.layers=2",
            "model.audio.heads=4",
            "model.audio.pre_encoder.patch_size=32",
            "model.text.width=64",
            "model.text.embed_dim=32",
            "model.text.encoder.layers=2",
            "model.text.heads=4",
            "running.audio.max_len=100",
            "model_file=",
            "eval=True",
        ],
        batch_size=4,
    )
    assert eng.embed_texts([]).shape == (0, 32)


def test_export_frame_embeddings_roundtrip(tmp_path):
    """Generator + consumer of precomputed frame embeddings: the engine
    writes {id}.{stem}.npz files and the VA train loader's
    ``running.frame_emb`` path serves them verbatim as the image features
    (reference consumed these, `/root/reference/cvap/data/image_audio.py`,
    but shipped no generator)."""
    from data_synth import make_synth_va_index
    from vipant_tpu.data import build_image_audio_dataloader

    root = str(tmp_path)
    make_synth_va_index(root, "train", n=6, seconds=1.05)
    ov = [
        "+running=bimodal",
        "+model/image=vit_val",
        "+model/audio=vit_val",
        "+model/text=dummy",
        "+model/loss=ce",
        "+optimizer=standard",
        "+running/audio=default",
        "worker=CVAP",
        "model.image.width=64",
        "model.image.embed_dim=32",
        "model.image.encoder.layers=2",
        "model.image.heads=4",
        "running.audio.max_len=100",
        "model_file=",
        "eval=True",
    ]
    eng = InferenceEngine(ov, batch_size=4)
    out_dir = os.path.join(root, "femb")
    n = eng.export_frame_embeddings(os.path.join(root, "train.jsonl"), out_dir)
    assert n == 6
    saved = np.load(os.path.join(out_dir, "clip0.0.npz"))["v"]
    assert saved.shape == (32,)
    # direct-embedding parity for the same jpg
    direct = eng.embed_image_files([os.path.join(root, "frame", "clip0.0.jpg")])[0]
    np.testing.assert_allclose(saved, direct, rtol=1e-6)

    # consumer: the train loader serves the saved embedding as `image`
    from vipant_tpu.config import compose

    cfg = compose([
        "+running=bimodal",
        "+model/image=vit_val",
        "+model/audio=vit_val",
        "+model/text=transformer_val",
        "+running/audio=default",
        f"running.data_root={root}",
        "running.batch_size=3",
        "running.audio.max_len=100",
        "running.frame_emb=femb",
        "num_proc=2",
    ])
    loader = build_image_audio_dataloader(cfg, "train", train=True)
    batch = next(iter(loader))
    img = np.asarray(batch["image"])
    assert img.shape == (3, 32)
    names = list(batch["name"])
    for row, name in zip(img, names):
        want = np.load(os.path.join(out_dir, f"{name}.0.npz"))["v"]
        np.testing.assert_allclose(row, want, rtol=1e-6)


def test_frame_emb_passthrough_train_step(tmp_path):
    """Precomputed [B, D] frame embeddings flow through CVAP's rank/dtype
    passthrough into the contrastive loss (the reference's precomputed-
    feature train mode, `/root/reference/cvap/model/cvalp.py:34-62`)."""
    from data_synth import make_synth_va_index
    from vipant_tpu.config import compose
    from vipant_tpu.data import build_image_audio_dataloader
    from vipant_tpu.models import build_main_model, init_model
    import jax.numpy as jnp

    root = str(tmp_path)
    make_synth_va_index(root, "train", n=4, seconds=1.05)
    ov = [
        "+running=bimodal", "+model/image=vit_val", "+model/audio=vit_val",
        "+model/text=dummy", "+model/loss=ce", "+optimizer=standard",
        "+running/audio=default", "worker=CVAP",
        "model.image.width=64", "model.image.embed_dim=32",
        "model.image.encoder.layers=2", "model.image.heads=4",
        "running.audio.max_len=100", "model_file=", "eval=True",
    ]
    eng = InferenceEngine(ov, batch_size=4)
    eng.export_frame_embeddings(os.path.join(root, "train.jsonl"), os.path.join(root, "femb"))

    cfg = compose(ov[:-2] + [
        f"running.data_root={root}", "running.batch_size=4",
        "running.frame_emb=femb", "num_proc=2", "compute_dtype=float32",
    ])
    model = build_main_model(cfg)
    variables = init_model(cfg, model)
    loader = build_image_audio_dataloader(cfg, "train", train=True)
    batch = next(iter(loader))
    out = model.apply(
        variables, jnp.asarray(batch["image"]), jnp.asarray(batch["audio"]), train=True
    )
    loss = out[0] if isinstance(out, tuple) else out
    assert np.isfinite(float(loss))


def test_http_server_routes(tmp_path, engine):
    """The stdlib HTTP endpoint over InferenceEngine: health, text/audio
    embeddings, zero-shot; a failing route returns JSON 5xx without
    killing the server."""
    import base64
    import json
    import threading
    import urllib.request

    from data_synth import _tone_wav
    from vipant_tpu.serve import make_server

    wav = os.path.join(str(tmp_path), "a.wav")
    _tone_wav(wav, 1.05, freq=440, seed=0)

    srv = make_server(engine, port=0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"

    def post(path, data, ctype="application/json"):
        req = urllib.request.Request(
            base + path, data=data, headers={"Content-Type": ctype}
        )
        try:
            with urllib.request.urlopen(req) as r:
                return r.status, json.loads(r.read())
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read())

    try:
        with urllib.request.urlopen(base + "/health") as r:
            assert json.loads(r.read()) == {"ok": True}

        code, out = post("/embed_text", json.dumps({"texts": ["a dog", "rain"]}).encode())
        assert code == 200
        emb = np.asarray(out["embeddings"])
        assert emb.shape == (2, 32)
        np.testing.assert_allclose(np.linalg.norm(emb, axis=-1), 1.0, rtol=1e-2)

        raw = open(wav, "rb").read()
        code, out = post("/embed_audio", raw, ctype="audio/wav")
        assert code == 200 and np.asarray(out["embeddings"]).shape == (1, 32)

        b64 = base64.b64encode(raw).decode()
        code, out = post(
            "/zero_shot",
            json.dumps({"labels": ["dog", "rain"], "wav_b64": b64}).encode(),
        )
        assert code == 200
        assert out["classes"] == ["dog", "rain"] and len(out["prediction"]) == 1
        assert np.asarray(out["scores"]).shape == (1, 2)

        # no decoder in this config: /caption must fail as JSON 5xx, server stays up
        code, out = post("/caption", raw, ctype="audio/wav")
        assert code >= 400 and "error" in out
        with urllib.request.urlopen(base + "/health") as r:
            assert json.loads(r.read()) == {"ok": True}

        code, out = post("/nope", b"{}")
        assert code == 404

        # client errors map to 400 with actionable messages (regressions):
        # explicitly-empty wavs_b64 used to surface as KeyError('wav_b64'),
        # and over-long text as a 500 via the tokenizer's RuntimeError
        code, out = post("/embed_audio", json.dumps({"wavs_b64": []}).encode())
        assert code == 400 and "empty" in out["error"]
        code, out = post(
            "/embed_text", json.dumps({"texts": ["dog " * 200]}).encode()
        )
        assert code == 400 and "too long" in out["error"]
    finally:
        srv.shutdown()


def test_zero_shot_rejects_empty_prompt_class(engine):
    """A class with an empty prompt list must raise a clear error, not a
    zero-size reduction crash."""
    fb = np.zeros((1, 1, 100, 128), np.float32)
    with pytest.raises(ValueError, match="no prompts"):
        engine.zero_shot(fb, {"dog": ["a dog barking"], "rain": []})


def test_http_embed_image_route(tmp_path):
    """POST /embed_image: base64 image bytes through CLIP preprocessing to
    normalized embeddings (CVAP engine with an image tower)."""
    import base64
    import json
    import threading
    import urllib.request

    from data_synth import make_synth_va_index
    from vipant_tpu.serve import make_server

    make_synth_va_index(str(tmp_path), "train", n=2, seconds=0.3)
    jpgs = sorted(
        os.path.join(str(tmp_path), "frame", f)
        for f in os.listdir(os.path.join(str(tmp_path), "frame"))
    )
    cfg = [o for o in TINY if not o.startswith(("worker", "+model/text", "model.text"))]
    eng = InferenceEngine(cfg + ["+model/text=dummy", "worker=CVAP"], batch_size=2)
    srv = make_server(eng, port=0)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        blobs = [base64.b64encode(open(p, "rb").read()).decode() for p in jpgs]
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/embed_image",
            data=json.dumps({"images_b64": blobs}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            out = json.loads(r.read())
        emb = np.asarray(out["embeddings"])
        assert emb.shape == (2, 32)
        np.testing.assert_allclose(np.linalg.norm(emb, axis=-1), 1.0, rtol=1e-2)
        # matches the library path exactly
        lib = eng.embed_image_files(jpgs)
        np.testing.assert_allclose(emb, lib, rtol=1e-4, atol=1e-5)
    finally:
        srv.shutdown()


def test_frame_emb_string_frame_record(tmp_path):
    """String-valued 'frame' records (single frame, no list) also resolve
    precomputed embeddings under running.frame_emb."""
    import json as _json

    from data_synth import make_synth_va_index
    from vipant_tpu.config import compose
    from vipant_tpu.data import build_image_audio_dataloader

    root = str(tmp_path)
    make_synth_va_index(root, "train", n=4, seconds=1.05)
    # rewrite the index with string frames
    recs = [_json.loads(l) for l in open(os.path.join(root, "train.jsonl"))]
    with open(os.path.join(root, "train.jsonl"), "w") as f:
        for r in recs:
            r["frame"] = r["frame"][0]
            f.write(_json.dumps(r) + "\n")
    out_dir = os.path.join(root, "femb")
    os.makedirs(out_dir)
    for r in recs:
        np.savez(
            os.path.join(out_dir, f"{r['id']}.0.npz"),
            v=np.full(32, float(r["id"][-1]), np.float32),
        )
    cfg = compose([
        "+running=bimodal", "+model/image=vit_val", "+model/audio=vit_val",
        "+model/text=transformer_val", "+running/audio=default",
        f"running.data_root={root}", "running.batch_size=4",
        "running.audio.max_len=100", "running.frame_emb=femb", "num_proc=2",
    ])
    loader = build_image_audio_dataloader(cfg, "train", train=False)
    batch = next(iter(loader))
    img = np.asarray(batch["image"])
    assert img.shape == (4, 32)
    for row, name in zip(img, batch["name"]):
        assert np.all(row == float(name[-1])), (name, row[:3])


def test_stacked_engine_loads_unrolled_export(tmp_path, engine):
    """model.npz exports are canonically unrolled; an engine whose config
    carries pipeline-stacked trunks (e.g. a config.json snapshotted from a
    mesh.pipe>1 run) must re-lay the loaded tree and serve identical
    embeddings."""
    from vipant_tpu.ckpt.orbax_io import _flatten

    params = engine.variables["params"]
    step_dir = tmp_path / "run" / "00000009"
    os.makedirs(step_dir)
    np.savez(
        str(step_dir / "model.npz"),
        **{k: v for k, v in _flatten("", {"audio": params["audio"], "text": params["text"]})},
    )
    eng2 = InferenceEngine(
        TINY[:-2]
        + [
            f"model_root={tmp_path}", "model_name=run", "model_file=00000009",
            "model.audio.stacked=true", "model.text.stacked=true", "eval=True",
        ],
        batch_size=4,
    )
    blocks = eng2.variables["params"]["audio"]["encoder"]["transformer"]
    assert "blocks" in blocks and "block_0" not in blocks  # genuinely stacked
    rng = np.random.default_rng(5)
    fb = rng.standard_normal((2, 100, 128)).astype(np.float32)
    np.testing.assert_allclose(
        engine.embed_audio(fb), eng2.embed_audio(fb), rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        engine.embed_texts(["rain"]), eng2.embed_texts(["rain"]), rtol=1e-3, atol=1e-4
    )


def test_data_parallel_engine_matches_single_device(engine):
    """data_parallel=True shards each batch over the 8-device CPU mesh
    (weights replicated); embeddings must match the single-device engine —
    the inference analogue of the dp-mode scatter/gather
    (`/root/reference/cvap/model/cvap.py:28-39`)."""
    import jax

    assert jax.device_count() >= 2  # conftest forces an 8-device CPU mesh
    # 4*n keeps the default token_pack=4 active (packed batch n divides the
    # mesh), so both engines run the identical packed numerics path
    dp = InferenceEngine(TINY, batch_size=4 * jax.device_count(), data_parallel=True)
    rng = np.random.default_rng(7)
    fb = rng.standard_normal((11, 100, 128)).astype(np.float32)  # ragged tail
    a_dp = dp.embed_audio(fb)
    a_1d = engine.embed_audio(fb)
    np.testing.assert_allclose(a_dp, a_1d, rtol=2e-2, atol=2e-3)
    t_dp = dp.embed_texts(["a dog barking", "heavy rain"])
    t_1d = engine.embed_texts(["a dog barking", "heavy rain"])
    np.testing.assert_allclose(t_dp, t_1d, rtol=2e-2, atol=2e-3)
    # the engine's variables are placed on ALL devices, replicated
    leaf = jax.tree_util.tree_leaves(dp.variables)[0]
    assert len(leaf.sharding.device_set) == jax.device_count()


def test_model_parallel_engine_matches_single_device(engine):
    """model_parallel=2 Megatron-shards the encoder weights over a 2-way
    model axis (`parallel.param_shardings`: qkv/out head blocks, MLP
    columns/rows, vocab-row token embedding) with the leftover devices on
    the data axis; embeddings must match the single-device engine. The TP
    serving mode for towers too big for one chip's HBM — on TPU it composes
    with quantize='int8' (test_quant.py::test_int8_kernels_under_model_mesh)."""
    import jax

    if jax.device_count() < 4:
        pytest.skip("needs >=4 devices")
    dp = jax.device_count() // 2
    tp = InferenceEngine(
        TINY, batch_size=4 * dp, data_parallel=True, model_parallel=2
    )
    assert int(tp.mesh.shape["model"]) == 2 and int(tp.mesh.shape["data"]) == dp
    rng = np.random.default_rng(9)
    fb = rng.standard_normal((9, 100, 128)).astype(np.float32)
    np.testing.assert_allclose(
        tp.embed_audio(fb), engine.embed_audio(fb), rtol=2e-2, atol=2e-3
    )
    np.testing.assert_allclose(
        tp.embed_texts(["a dog barking", "heavy rain"]),
        engine.embed_texts(["a dog barking", "heavy rain"]),
        rtol=2e-2, atol=2e-3,
    )
    # weights must actually be model-sharded at rest, not replicated
    sharded = [
        leaf
        for leaf in jax.tree_util.tree_leaves(tp.variables)
        if hasattr(leaf, "sharding") and not leaf.sharding.is_fully_replicated
    ]
    assert sharded, "model_parallel=2 left every weight leaf replicated"

    # pure TP (no data axis): mesh is 1 x 2, batch replicated over model
    tp_only = InferenceEngine(TINY, batch_size=4, model_parallel=2)
    assert int(tp_only.mesh.shape["data"]) == 1
    np.testing.assert_allclose(
        tp_only.embed_audio(fb[:4]), engine.embed_audio(fb[:4]),
        rtol=2e-2, atol=2e-3,
    )


def test_data_parallel_rejects_indivisible_batch():
    import jax

    if jax.device_count() < 2:
        pytest.skip("needs a multi-device mesh")
    with pytest.raises(ValueError, match="not divisible"):
        InferenceEngine(TINY, batch_size=3, data_parallel=True)


def test_quantize_is_engine_scoped_not_process_global(engine):
    """quantize='int8' must not leak into later engines: the mode lives on
    the engine (int8_fwd_context around every traced call), never in the
    VIPANT_INT8_* env vars (review finding, round 3)."""
    import os

    from vipant_tpu.ops.quant import int8_fwd_enabled

    for var in ("VIPANT_INT8_MLP", "VIPANT_INT8_ATTN"):
        assert os.environ.get(var) != "1"
    os.environ["VIPANT_FUSED_MLP"] = "1"  # required by the quantize check
    try:
        q = InferenceEngine(TINY, batch_size=4, quantize="int8")
        # building the int8 engine leaves the process env untouched
        for var in ("VIPANT_INT8_MLP", "VIPANT_INT8_ATTN"):
            assert os.environ.get(var) != "1"
        assert q._int8 and not engine._int8
        # the contextvar is live exactly inside _call (where traces happen)
        seen = {}

        def probe(variables, chunk):
            seen["int8"] = int8_fwd_enabled()
            return chunk

        q._call(probe, np.zeros(1))
        assert seen["int8"] is True
        engine._call(probe, np.zeros(1))
        assert seen["int8"] is False
        assert int8_fwd_enabled() is False  # context restored
    finally:
        os.environ.pop("VIPANT_FUSED_MLP", None)


def test_token_pack_dp_fallback():
    """batch_size=8 over an 8-device data mesh leaves a packed batch of 2
    (default token_pack=4) that cannot shard — the engine must drop packing
    (and say so) instead of crashing at trace time on TPU."""
    import jax

    if jax.device_count() < 2:
        pytest.skip("needs a multi-device mesh")
    n = jax.device_count()
    dp = InferenceEngine(TINY, batch_size=n, data_parallel=True)
    assert dp._token_pack == 1 and "packing disabled" in dp.echo_note
    dp_big = InferenceEngine(TINY, batch_size=4 * n, data_parallel=True)
    assert dp_big._token_pack == 4 and not dp_big.echo_note


def test_embed_image_bytes_shares_preprocessing(tmp_path, engine):
    """The HTTP /embed_image route and embed_image_files must run the SAME
    preprocessing: preprocess_images accepts paths and file-like sources."""
    import io

    from PIL import Image

    p = tmp_path / "img.png"
    arr = (np.random.default_rng(3).random((40, 60, 3)) * 255).astype(np.uint8)
    Image.fromarray(arr).save(p)
    via_path = engine.preprocess_images([str(p)])
    via_bytes = engine.preprocess_images([io.BytesIO(p.read_bytes())])
    np.testing.assert_array_equal(via_path, via_bytes)
    assert via_path.shape[1] == 3
