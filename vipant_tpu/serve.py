"""Production batched inference for trained VIP-ANT models.

The reference's deployment story was ad-hoc scripts around the monitors
(embedding dumps `/root/reference/cvap/monitor/audioset_clf.py:70-98`,
zero-shot `/root/reference/cvap/monitor/esc50_clf.py:294-325`); this module
packages the same capabilities as a standalone engine designed for TPU
serving: every encoder runs as a memoized jitted function at fixed batch
shapes (pad + trim, one compile per modality), embeddings come back
L2-normalized, and zero-shot classification reuses the multi-prompt
label-collapse semantics of the eval suite.

Usage (library)::

    from vipant_tpu.serve import InferenceEngine
    eng = InferenceEngine([
        "+running=bimodal", "+model/image=vit_val", "+model/audio=vit_val",
        "+model/text=transformer_val", "+model/loss=ce", "+optimizer=standard",
        "+running/audio=default", "worker=CLAP",
        "model_file=best.pth", "model_root=/ckpts", "model_name=at",
    ])
    a = eng.embed_audio_files(["clip1.wav", "clip2.wav"])   # [2, D]
    t = eng.embed_texts(["a dog barking", "rain"])          # [2, D]
    probs = a @ t.T

Usage (CLI)::

    python -m vipant_tpu.serve --task embed_audio --inputs '*.wav' \
        --output embs.npz -- +running=bimodal ... model_file=best.pth
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Sequence

import numpy as np


class InferenceEngine:
    """Checkpoint-to-embeddings engine with fixed-shape jitted encoders.

    ``cfg``: a composed :class:`vipant_tpu.config.Config` or a list of
    hydra-style override strings. ``batch_size`` fixes the device batch —
    inputs are chunked, the final chunk zero-padded and trimmed.

    ``fused_mlp`` (default True) exports ``VIPANT_FUSED_MLP=1`` unless the
    caller already set it: serving is forward-only, where the fused LN+MLP
    kernel wins (+12% at B=256 — `experiments/serve_bench.py`). The switch
    is process-global; pass ``fused_mlp=False`` if a *training* step will
    be traced later in this same TPU process (training measures faster on
    the XLA MLP path — docs/performance.md).

    ``quantize="int8"`` additionally routes the MLP dots and the attention
    qkv / output projections through int8-MXU kernels
    (`ops/fused_mlp.fused_ln_mlp_block_int8`,
    `ops/fused_attn.fused_ln_attention_block_int8`): weights
    per-output-channel, activations per-token dynamic, quantized in VMEM.
    Measured 2435 → 3070 clips/s (+26%) on audio embedding at B=256 with
    embedding cosine ≥ 0.999 vs bf16 (docs/performance.md); serving-only
    (no backward). Requires ``fused_mlp=True`` (the int8 MLP lives inside
    the fused kernel dispatch) — also process-global.

    ``data_parallel=True`` shards every device batch over ALL local devices
    (1-D ``data`` mesh, weights replicated): one jitted call encodes
    ``batch_size`` items across the slice, the TPU-native analogue of the
    reference's dp-mode per-head scatter/gather
    (`/root/reference/cvap/model/cvap.py:28-39`) for inference. No-op on a
    single device.

    ``model_parallel=N`` tensor-parallelizes the encoders over an N-way
    ``model`` mesh axis (Megatron weight sharding via
    `parallel.param_shardings`: qkv/out head blocks, MLP fc columns / proj
    rows, vocab-row token embeddings) — for towers too big for one chip's
    HBM. Composes with ``data_parallel`` (remaining devices form the
    ``data`` axis) and with ``quantize='int8'`` (the int8 kernels shard
    over the model axis too — docs/performance.md).
    """

    def __init__(
        self,
        cfg,
        batch_size: int = 64,
        echo=None,
        fused_mlp: bool = True,
        token_pack: int = 4,
        quantize: str = "",
        data_parallel: bool = False,
        model_parallel: int = 1,
    ):
        import jax

        from .config import Config, compose
        from .models import build_main_model, init_model
        from .utils import setup_logger

        # persistent compiled-executable cache: a restarted server skips the
        # 20-70s first-compile of each encoder (same knob as train.py)
        cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
        try:
            os.makedirs(cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:  # noqa: BLE001 - cache is best-effort
            pass
        if fused_mlp and "VIPANT_FUSED_MLP" not in os.environ:
            # fwd-only workload: the fused LN+MLP kernel measured +12% at
            # B=256 (experiments/serve_bench.py) — on by default here, while
            # training keeps the XLA path (docs/performance.md)
            os.environ["VIPANT_FUSED_MLP"] = "1"
        if quantize:
            if quantize != "int8":
                raise ValueError(f"unknown quantize mode {quantize!r} (only 'int8')")
            if os.environ.get("VIPANT_FUSED_MLP") != "1":
                raise ValueError(
                    "quantize='int8' requires the fused MLP path (fused_mlp=True)"
                )
        # int8 is scoped per-engine via int8_fwd_context (ops/quant.py), NOT
        # process-global env vars: a later bf16 engine in the same process
        # must not inherit int8 numerics from an earlier quantized one.
        # (The VIPANT_INT8_* env vars remain an explicit user-level override
        # read by the layers; the engine itself never sets them.)
        self._int8 = bool(quantize)
        self.cfg = cfg if isinstance(cfg, Config) else compose(list(cfg))
        # Token packing reshapes [B, T, C] -> [B/pack, pack*T, C] BEFORE the
        # fused TPU kernels shard_map dim 0 over the data axis, so under
        # data_parallel the PACKED batch must divide the mesh; when it
        # doesn't, drop packing rather than crash at trace time (at
        # B/n items per device the packing win is marginal anyway).
        mp_n = max(1, int(model_parallel))
        # LOCAL devices only: the engine is a single-process deployment
        # unit — under multi-process JAX each host serves independently on
        # its own chips (a global-device mesh would span non-addressable
        # devices and crash on the first batch)
        if jax.local_device_count() % mp_n:
            raise ValueError(
                f"model_parallel={mp_n} does not divide the "
                f"{jax.local_device_count()} local devices"
            )
        avail = jax.local_device_count() // mp_n
        dp_n = avail if data_parallel and avail > 1 else 1
        if token_pack > 1 and dp_n > 1 and (batch_size // token_pack) % dp_n:
            self.echo_note = (
                f"token_pack={token_pack} incompatible with batch_size "
                f"{batch_size} over the {dp_n}-device data mesh "
                f"(packed batch {batch_size // token_pack}); packing disabled"
            )
            token_pack = 1
        else:
            self.echo_note = ""
        if token_pack > 1 and batch_size % token_pack == 0:
            # exact block-diagonal attention packing for the short image
            # (T=50) / caption (T=77, per-segment causal) sequences
            # (docs/performance.md round-3); engine batches are zero-padded
            # to batch_size so divisibility always holds. Patch a COPY —
            # the caller's config may build a trainer later.
            patched = Config(self.cfg.to_dict(resolve=False))
            changed = False
            for key in ("image", "text"):
                head = patched.get("model", Config({})).get(key)
                if (
                    head is not None
                    and hasattr(head, "get")
                    and str(head.get("encoder", Config({})).get("name", ""))
                    == "TransformerBackbone"
                    and head.get("token_pack", None) is None
                ):
                    head["token_pack"] = int(token_pack)
                    changed = True
            if changed:
                self.cfg = patched
            self._token_pack = int(token_pack) if changed else 1
        else:
            self._token_pack = 1
        self.batch_size = int(batch_size)
        self.echo = echo or setup_logger(None, 0, verbose=False)
        if self.echo_note:
            self.echo.info(self.echo_note)
        self.model = build_main_model(self.cfg)
        variables = init_model(self.cfg, self.model)
        self.variables = self._load(variables)
        self.mesh = None
        if dp_n > 1 or mp_n > 1:
            from .parallel import attn_heads_map, make_mesh, replicate, shard_params

            # data axis takes the devices the model axis leaves over (all
            # of them when model_parallel=1, exactly 1 when data_parallel
            # is off)
            self.mesh = make_mesh(
                data=dp_n, model=mp_n, devices=jax.local_devices()
            )
            n = int(self.mesh.shape["data"])
            if self.batch_size % n:
                raise ValueError(
                    f"batch_size {self.batch_size} not divisible by the "
                    f"{n}-device data mesh"
                )
            # the packed batch must divide the data mesh. The engine's own
            # pack is guaranteed by the fallback above, but a token_pack
            # already present in the CONFIG bypasses it — validate the
            # effective pack instead of crashing opaquely at trace time
            eff_pack = self._token_pack
            m = self.cfg.get("model")
            for key in ("image", "text"):
                head = m.get(key) if m is not None else None
                try:
                    p = head.get("token_pack") if head is not None else None
                    if p:
                        eff_pack = max(eff_pack, int(p))
                except Exception:  # noqa: BLE001 — interpolations
                    pass
            if (self.batch_size // eff_pack) % n:
                raise ValueError(
                    f"packed batch {self.batch_size}//{eff_pack} not "
                    f"divisible by the {n}-device data mesh — lower "
                    "model.*.token_pack or adjust batch_size/data_parallel"
                )
            if mp_n > 1:
                # Megatron weight placement (same rules as training,
                # parallel.param_shardings); non-param collections
                # (batch_stats) replicate
                heads = attn_heads_map(self.cfg.get("model"))
                self.variables = {
                    key: (
                        shard_params(val, self.mesh, attn_heads=heads)
                        if key == "params"
                        else replicate(val, self.mesh)
                    )
                    for key, val in self.variables.items()
                }
            else:
                self.variables = replicate(self.variables, self.mesh)
        self._jitted: Dict[str, Any] = {}
        self._jax = jax

    # ------------------------------------------------------------- loading
    def _load(self, variables):
        import jax

        from .ckpt.loading import apply_reference_ckpt, clip_weights_path

        cfg = self.cfg
        model_file = str(cfg.get("model_file", "") or "")
        ckpt_path = os.path.join(
            str(cfg.get("model_root", "") or ""), str(cfg.get("model_name", "") or ""),
            model_file,
        )
        if model_file.endswith(".pth"):
            for cand in (ckpt_path, model_file):
                if os.path.exists(cand):
                    return apply_reference_ckpt(self.model, variables, cand, echo=self.echo)
            # silently serving random-init weights would look valid
            # (unit-norm embeddings) — fail loudly instead
            raise FileNotFoundError(
                f"model_file {model_file!r} not found at {ckpt_path!r} or as a direct path"
            )
        if model_file:
            if not os.path.isdir(ckpt_path):
                # same fail-loudly rule as the .pth branch: random-init
                # embeddings look valid and would silently serve garbage
                raise FileNotFoundError(
                    f"model_file {model_file!r} not found at {ckpt_path!r}"
                )
            # the weight-only export written beside every Orbax state
            npz = os.path.join(ckpt_path, "model.npz")
            if not os.path.exists(npz):
                raise FileNotFoundError(
                    f"{ckpt_path} has no model.npz; full-train-state resume "
                    "belongs to the trainer, not the inference engine"
                )
            data = np.load(npz)
            # most monitors export only {audio, loss} (the reference's
            # 2-tuple); the eval path must still seed the OTHER towers from
            # CLIP, exactly as the reference's eval build loads ckpt + CLIP
            # (`/root/reference/cvap/model/cvap.py:61-99`) — otherwise
            # embed_texts/embed_images would serve random-init towers whose
            # unit-norm outputs look valid
            covered = {k.split(".")[0] for k in data.files}
            uncovered = [
                t
                for t in ("image", "audio", "text")
                if t in variables["params"]
                and len(jax.tree_util.tree_leaves(variables["params"][t])) > 0
                and t not in covered
            ]
            if uncovered:
                clip_path = clip_weights_path(cfg)
                if clip_path:
                    from .ckpt import load_torch_file
                    from .models import port_model_from_clip

                    _, sd = load_torch_file(clip_path)
                    variables = port_model_from_clip(cfg, self.model, variables, sd)
                    self.echo.info(
                        f"towers {uncovered} not in {npz}: seeded from CLIP "
                        f"weights {clip_path}"
                    )
                else:
                    raise ValueError(
                        f"{npz} covers only {sorted(covered)} but the model has "
                        f"tower(s) {uncovered}; serving them at random init "
                        "would produce plausible-looking garbage — set "
                        "running.clip_model_root/name so they load CLIP "
                        "weights, or export a checkpoint covering all towers"
                    )
            params = dict(variables["params"])
            # exports are canonically unrolled (block_{i}); if this model
            # was configured with a pipeline-stacked trunk, re-lay the
            # loaded tree to match before key-by-key application
            src_nested: dict = {}
            for flat_key in data.files:
                node, parts = src_nested, flat_key.split(".")
                for p in parts[:-1]:
                    node = node.setdefault(p, {})
                node[parts[-1]] = data[flat_key]
            from .parallel.pipeline import adapt_trunk_layout

            src_nested = adapt_trunk_layout(src_nested, params)

            def _flat(prefix, tree):
                for k, v in tree.items():
                    key = f"{prefix}.{k}" if prefix else k
                    if isinstance(v, dict):
                        yield from _flat(key, v)
                    else:
                        yield key, v

            for flat_key, value in _flat("", src_nested):
                node, parts = params, flat_key.split(".")
                for p in parts[:-1]:
                    if p not in node:
                        raise ValueError(
                            f"{npz} key {flat_key!r} does not exist in this "
                            "model — export/config mismatch"
                        )
                    node = node[p]
                leaf = parts[-1]
                if leaf not in node:
                    raise ValueError(
                        f"{npz} key {flat_key!r} does not exist in this "
                        "model — export/config mismatch"
                    )
                have = np.shape(node[leaf])
                want = np.shape(value)
                if tuple(have) != tuple(want):
                    raise ValueError(
                        f"{npz} key {flat_key!r} has shape {want}, model "
                        f"expects {have} — export/config mismatch"
                    )
                node[leaf] = value
            self.echo.info(f"loaded weight export {npz} ({len(data.files)} arrays)")
            return {**variables, "params": params}
        # only reachable with model_file == "" (every non-empty model_file
        # branch above returns or raises)
        clip_path = clip_weights_path(self.cfg)
        if clip_path:
            from .ckpt import load_torch_file
            from .models import port_model_from_clip

            _, sd = load_torch_file(clip_path)
            variables = port_model_from_clip(self.cfg, self.model, variables, sd)
            self.echo.info(f"initialized towers from CLIP weights {clip_path}")
        return variables

    # --------------------------------------------------------------- encode
    def _encoder(self, method: str):
        import jax
        import jax.numpy as jnp

        if method not in self._jitted:

            def fn(variables, x):
                out = self.model.apply(variables, x, train=False, method=method)
                return out / jnp.linalg.norm(out, axis=-1, keepdims=True).clip(1e-8)

            self._jitted[method] = jax.jit(fn)
        return self._jitted[method]

    def _embed_dim(self) -> int:
        """The shared embedding dimensionality, tolerant of configs with no
        image tower (audio-text engines): loss head first, then any tower
        that declares one."""
        model = self.cfg.model
        for group in ("loss", "image", "audio", "text"):
            try:  # values may be interpolations into absent groups
                node = model.get(group, None)
                d = node.get("embed_dim", None) if node is not None else None
                if d:
                    return int(d)
            except Exception:
                continue
        raise ValueError("no embed_dim found in model config")

    def _call(self, fn, chunk):
        """One jitted call; under ``data_parallel`` the batch axis shards
        over the device mesh (weights stay replicated) and GSPMD runs the
        encoder SPMD — each device sees batch_size / n_devices items.

        Wrapped in :func:`int8_fwd_context` so ``quantize='int8'`` is scoped
        to THIS engine's traces (the contextvar is read at trace time, and
        every first-call trace happens inside ``_call``)."""
        from .ops.quant import int8_fwd_context

        with int8_fwd_context(self._int8):
            if self.mesh is None:
                return fn(self.variables, chunk)
            from .parallel import shard_batch

            with self._jax.sharding.set_mesh(self.mesh):
                return fn(self.variables, shard_batch(np.asarray(chunk), self.mesh))

    def _run_batched(self, method: str, arr: np.ndarray) -> np.ndarray:
        """Chunk [N, ...] host array into fixed [B, ...] device batches."""
        if arr.shape[0] == 0:
            return np.zeros((0, self._embed_dim()), np.float32)
        fn = self._encoder(method)
        B = self.batch_size
        outs = []
        for i in range(0, arr.shape[0], B):
            chunk = arr[i : i + B]
            n = chunk.shape[0]
            if n < B:  # pad to the fixed compile shape
                pad = np.repeat(chunk[-1:], B - n, axis=0)
                chunk = np.concatenate([chunk, pad], axis=0)
            # fp32 on the host: bf16-model outputs savez'd as bfloat16 are
            # unreadable by plain NumPy (ml_dtypes descriptor), and every
            # consumer of a [N, D] embedding matrix wants floats
            out = np.asarray(self._call(fn, chunk), dtype=np.float32)
            outs.append(out[:n])
        return np.concatenate(outs, axis=0)

    def embed_audio(self, fbanks: np.ndarray) -> np.ndarray:
        """[N, T, M] or [N, 1, T, M] log-mel batches → [N, D] normalized."""
        a = np.asarray(fbanks, np.float32)
        if a.ndim == 3:
            a = a[:, None]
        return self._run_batched("encode_audio", a)

    def fbank_files(self, paths: Sequence[str]) -> np.ndarray:
        """wav files → [N, T, M] log-mel (host frontend, eval crop)."""
        from .data.image_audio import fbank_params_from_cfg
        from .data.transforms_audio import extract_fbank_features

        acfg = self.cfg.running.audio
        params = fbank_params_from_cfg(acfg)
        return np.stack([
            extract_fbank_features(
                p,
                params,
                max_audio_len=int(self.cfg.running.max_audio_len),
                train=False,
                zero_mean_wf=bool(acfg.get("zero_mean_wf", True)),
                norms=tuple(acfg.get("norms", []) or []) or None,
            )
            for p in paths
        ])

    def embed_audio_files(self, paths: Sequence[str]) -> np.ndarray:
        """wav files → fbank (host frontend, eval crop) → embeddings."""
        return self.embed_audio(self.fbank_files(paths))

    def embed_texts(self, texts: Sequence[str], prompt: str = "") -> np.ndarray:
        """Strings → BPE ids (fixed ctx padding) → [N, D] normalized."""
        from .tokenizer import tokenize

        ctx = int(self.cfg.model.text.get("ctx_len", 77))
        ids = tokenize([f"{prompt}{t}" for t in texts], context_length=ctx)
        return self._run_batched("encode_text", ids.astype(np.int32))

    def embed_images(self, images: np.ndarray) -> np.ndarray:
        """[N, 3, H, W] CLIP-preprocessed images → [N, D] normalized."""
        return self._run_batched("encode_image", np.asarray(images, np.float32))

    def export_frame_embeddings(
        self, index_path: str, out_dir: str, frame_key: str = "frame"
    ) -> int:
        """Precompute per-frame image embeddings for a VA index: writes
        ``{out_dir}/{id}.{stem}.npz`` (key ``"v"``, [D] fp32) for EVERY
        frame of every record — the files the ``running.frame_emb`` train
        path consumes (`data/image_audio.py:_image_emb`). The reference
        CONSUMED precomputed frame embeddings
        (`/root/reference/cvap/data/image_audio.py:209-219`) but shipped no
        generator; this is it. Returns the number of files written."""
        from .data.indexfile import load_jsonl

        recs = load_jsonl(index_path)
        data_root = os.path.dirname(os.path.abspath(index_path))
        os.makedirs(out_dir, exist_ok=True)
        paths, outs = [], []
        for rec in recs:
            name = rec["id"]
            sub = str(rec.get("dir", "") or "")
            if sub and not sub.endswith("/"):
                sub += "/"
            frames = rec.get(frame_key)
            if frames is None:
                continue
            if isinstance(frames, str):
                frames = [frames]
            for ext in frames:
                stem = ext.rsplit(".", 1)[0]
                paths.append(f"{data_root}/{sub}{frame_key}/{name}.{ext}")
                outs.append(os.path.join(out_dir, f"{name}.{stem}.npz"))
        if not paths:
            return 0
        # chunked: preprocess + embed + write per slice so host memory stays
        # bounded and a crash loses at most one chunk (production indexes
        # run to millions of frames)
        chunk = max(self.batch_size * 4, 64)
        for i in range(0, len(paths), chunk):
            embs = self.embed_image_files(paths[i : i + chunk])
            for o, v in zip(outs[i : i + chunk], embs):
                np.savez(o, v=np.asarray(v, np.float32))
        self.echo.info(f"wrote {len(outs)} frame embeddings to {out_dir}")
        return len(outs)

    def preprocess_images(self, sources: Sequence[Any]) -> np.ndarray:
        """PIL-openable sources (paths or file-like) → CLIP preprocessing
        (bicubic resize, center crop, normalize) → [N, 3, R, R] fp32. Host
        CPU only — the HTTP server runs it outside the device lock."""
        from PIL import Image

        from .data.transforms_image import clip_preprocess

        res = int(self.cfg.running.get("resolution", 224))
        return np.stack([clip_preprocess(Image.open(p), res) for p in sources])

    def embed_image_files(self, paths: Sequence[str]) -> np.ndarray:
        """Image files → [N, D] normalized embeddings."""
        return self.embed_images(self.preprocess_images(paths))

    # ------------------------------------------------------------ captioning
    def caption(self, fbanks: np.ndarray, beam: int = 0) -> List[str]:
        """[N, T, M] log-mel → decoded caption strings (KV-cached greedy,
        or beam search with ``beam`` > 1). Requires a captioning model
        (CLAP with a SeqGenerationHead decoder)."""
        import jax

        from .tokenizer import detokenize_ids

        key = f"decode_b{int(beam)}"
        if key not in self._jitted:
            self._jitted[key] = jax.jit(
                lambda v, a: self.model.apply(v, a, beam=int(beam), method="decode")
            )
        fn = self._jitted[key]
        a = np.asarray(fbanks, np.float32)
        if a.ndim == 3:
            a = a[:, None]
        B = self.batch_size
        out: List[str] = []
        for i in range(0, a.shape[0], B):
            chunk = a[i : i + B]
            n = chunk.shape[0]
            if n < B:
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], B - n, axis=0)], axis=0
                )
            ids, _ = self._call(fn, chunk)
            for row in np.asarray(ids)[:n]:
                out.append(detokenize_ids(row))
        return out

    def caption_files(self, paths: Sequence[str], beam: int = 0) -> List[str]:
        return self.caption(self.fbank_files(paths), beam=beam)

    # ------------------------------------------------------------ zero-shot
    def zero_shot(
        self,
        fbanks: np.ndarray,
        class_prompts: Dict[str, Sequence[str]],
        temperature: float = 100.0,
    ) -> Dict[str, Any]:
        """Multi-prompt zero-shot classification: per-class prompt
        embeddings are scored and collapsed by max over prompts (the
        reference's label_map semantics,
        `/root/reference/cvap/module/decoder/loss_head.py:365-407`)."""
        classes = list(class_prompts)
        flat, owner = [], []
        for ci, c in enumerate(classes):
            if not class_prompts[c]:
                raise ValueError(
                    f"class {c!r} has no prompts — every class needs at "
                    "least one prompt text"
                )
            for p in class_prompts[c]:
                flat.append(p)
                owner.append(ci)
        t = self.embed_texts(flat)
        a = self.embed_audio(fbanks)
        sims = a @ t.T  # [N, P]
        owner_arr = np.asarray(owner)
        per_class = np.stack(
            [sims[:, owner_arr == ci].max(axis=1) for ci in range(len(classes))], axis=1
        )
        probs = _softmax(per_class * temperature)
        pred = per_class.argmax(axis=1)
        return {
            "classes": classes,
            "scores": per_class,
            "probs": probs,
            "prediction": [classes[i] for i in pred],
        }


def _softmax(x: np.ndarray) -> np.ndarray:
    e = np.exp(x - x.max(axis=-1, keepdims=True))
    return e / e.sum(axis=-1, keepdims=True)


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------


def make_server(engine: "InferenceEngine", port: int = 8080, host: str = "127.0.0.1"):
    """Minimal production HTTP endpoint over an :class:`InferenceEngine`
    (stdlib only). Routes (JSON out; errors -> {"error": ...} with 4xx/5xx):

    - ``GET  /health`` → ``{"ok": true}``
    - ``POST /embed_text`` ``{"texts": [...], "prompt": ""}`` →
      ``{"embeddings": [[...]]}``
    - ``POST /embed_audio`` raw WAV body (Content-Type audio/wav) or JSON
      ``{"wav_b64": "..."}`` → ``{"embeddings": [[...]]}``
    - ``POST /embed_image`` JSON ``{"images_b64": ["...jpg/png bytes..."]}``
      (or singular ``image_b64``) → ``{"embeddings": [[...]]}``
    - ``POST /caption?beam=N`` raw WAV body or ``{"wav_b64": ...}`` →
      ``{"captions": ["..."]}``
    - ``POST /zero_shot`` JSON ``{"labels": [...], "prompt": "the sound of ",
      "wav_b64": ...}`` → ``{"classes": [...], "scores": [[...]],
      "prediction": [...]}``

    One TPU: inference calls serialize through a lock. Returns the
    ``ThreadingHTTPServer`` (call ``serve_forever()`` /  ``shutdown()``)."""
    import base64
    import io
    import json as _json
    import tempfile
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    from urllib.parse import parse_qs, urlparse

    lock = threading.Lock()

    def wavs_from_request(body: bytes, ctype: str, payload=None) -> List[str]:
        """Request → temp wav file paths (host fbank frontend reads files).
        Pass ``payload`` when the caller already parsed the JSON body (the
        /zero_shot route) to avoid decoding a large base64 body twice."""
        if ctype.startswith("application/json"):
            if payload is None:
                payload = _json.loads(body)
            if "wavs_b64" in payload:
                blobs = payload["wavs_b64"]
                if not blobs:
                    raise ValueError("wavs_b64 is empty — supply at least one clip")
            else:
                blobs = [payload["wav_b64"]]
            raws = [base64.b64decode(b) for b in blobs]
        else:
            raws = [body]
        paths = []
        for raw in raws:
            f = tempfile.NamedTemporaryFile(suffix=".wav", delete=False)
            f.write(raw)
            f.close()
            paths.append(f.name)
        return paths

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # route to the engine logger
            engine.echo.info("http " + fmt % args)

        def _send(self, code: int, obj) -> None:
            data = _json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):
            if urlparse(self.path).path == "/health":
                self._send(200, {"ok": True})
            else:
                self._send(404, {"error": f"no route {self.path}"})

        def do_POST(self):
            url = urlparse(self.path)
            q = parse_qs(url.query)
            body = self.rfile.read(int(self.headers.get("Content-Length", 0)))
            ctype = self.headers.get("Content-Type", "")
            tmp: List[str] = []
            try:
                if url.path == "/embed_text":
                    payload = _json.loads(body)
                    with lock:
                        emb = engine.embed_texts(
                            payload["texts"], prompt=payload.get("prompt", "")
                        )
                    self._send(200, {"embeddings": emb.tolist()})
                elif url.path == "/embed_audio":
                    tmp = wavs_from_request(body, ctype)
                    fb = engine.fbank_files(tmp)  # host CPU: outside the lock
                    with lock:
                        emb = engine.embed_audio(fb)
                    self._send(200, {"embeddings": emb.tolist()})
                elif url.path == "/embed_image":
                    payload = _json.loads(body)
                    blobs = payload.get("images_b64") or [payload["image_b64"]]
                    # decode + CLIP preprocess on the host, outside the lock
                    imgs = engine.preprocess_images(
                        [io.BytesIO(base64.b64decode(b)) for b in blobs]
                    )
                    with lock:
                        emb = engine.embed_images(imgs)
                    self._send(200, {"embeddings": emb.tolist()})
                elif url.path == "/caption":
                    tmp = wavs_from_request(body, ctype)
                    beam = int(q.get("beam", ["0"])[0])
                    fb = engine.fbank_files(tmp)
                    with lock:
                        caps = engine.caption(fb, beam=beam)
                    self._send(200, {"captions": caps})
                elif url.path == "/zero_shot":
                    payload = _json.loads(body)
                    tmp = wavs_from_request(body, "application/json", payload=payload)
                    labels = payload["labels"]
                    prompt = payload.get("prompt", "the sound of ")
                    fb = engine.fbank_files(tmp)
                    with lock:
                        res = engine.zero_shot(
                            fb, {l: [f"{prompt}{l}"] for l in labels}
                        )
                    self._send(200, {
                        "classes": list(res["classes"]),
                        "scores": np.asarray(res["scores"]).tolist(),
                        "prediction": list(res["prediction"]),
                    })
                else:
                    self._send(404, {"error": f"no route {url.path}"})
            except (KeyError, ValueError, _json.JSONDecodeError) as e:
                self._send(400, {"error": f"{type(e).__name__}: {e}"})
            except RuntimeError as e:
                # the tokenizer raises RuntimeError for over-long client
                # text — a client error (400); any OTHER RuntimeError is a
                # genuine server fault and must stay a 500
                if "too long" in str(e):
                    self._send(400, {"error": f"{type(e).__name__}: {e}"})
                else:
                    self._send(500, {"error": f"{type(e).__name__}: {e}"})
            except Exception as e:  # noqa: BLE001 - survive bad requests
                self._send(500, {"error": f"{type(e).__name__}: {e}"})
            finally:
                for p in tmp:
                    try:
                        os.unlink(p)
                    except OSError:
                        pass

    return ThreadingHTTPServer((host, port), Handler)


def main(argv: Optional[List[str]] = None) -> int:
    import argparse
    import glob as _glob
    import sys

    ap = argparse.ArgumentParser(
        description="Batched VIP-ANT inference (embeddings / zero-shot). "
        "Config overrides follow `--` in hydra-style grammar."
    )
    ap.add_argument(
        "--task", required=True,
        choices=[
            "embed_audio", "embed_image", "embed_text", "zero_shot",
            "caption", "embed_frames", "serve",
        ],
    )
    ap.add_argument("--index", default="", help="embed_frames: VA index .jsonl")
    ap.add_argument(
        "--output_dir", default="", help="embed_frames: per-frame npz directory"
    )
    ap.add_argument("--port", type=int, default=8080, help="serve: HTTP port")
    ap.add_argument("--host", default="127.0.0.1", help="serve: bind address")
    ap.add_argument("--beam", type=int, default=0, help="caption: beam width (0 = greedy)")
    ap.add_argument("--inputs", default="", help="wav/image glob (embed_*/zero_shot)")
    ap.add_argument("--texts", default="", help="newline-separated file or inline ';'-list")
    ap.add_argument("--labels", default="", help="zero-shot: ';'-separated class names")
    ap.add_argument("--prompt", default="the sound of ", help="zero-shot prompt prefix")
    ap.add_argument("--output", default="out.npz")
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument(
        "--quantize", default="", choices=["", "int8"],
        help="int8: MXU-int8 MLP dots (serving only; cosine >= 0.999 vs bf16)",
    )
    ap.add_argument(
        "--data_parallel", action="store_true",
        help="shard each batch over all local devices (weights replicated)",
    )
    ap.add_argument(
        "--model_parallel", type=int, default=1,
        help="tensor-parallelize encoder weights over an N-way model axis "
        "(Megatron sharding; for towers too big for one chip)",
    )
    args, overrides = ap.parse_known_args(argv)
    overrides = [o for o in overrides if o != "--"]

    eng = InferenceEngine(
        overrides, batch_size=args.batch_size, quantize=args.quantize,
        data_parallel=args.data_parallel, model_parallel=args.model_parallel,
    )
    if args.task in ("embed_audio", "embed_image"):
        paths = sorted(_glob.glob(args.inputs))
        assert paths, f"no inputs match {args.inputs}"
        embed = eng.embed_audio_files if args.task == "embed_audio" else eng.embed_image_files
        np.savez(args.output, embeddings=embed(paths), names=np.array(paths))
    elif args.task == "caption":
        paths = sorted(_glob.glob(args.inputs))
        assert paths, f"no inputs match {args.inputs}"
        caps = eng.caption_files(paths, beam=args.beam)
        np.savez(args.output, captions=np.array(caps), names=np.array(paths))
        for p, c in zip(paths, caps):
            print(f"{p}\t{c}")
    elif args.task == "serve":
        srv = make_server(eng, port=args.port, host=args.host)
        print(f"serving on http://{args.host}:{args.port} (ctrl-c to stop)")
        try:
            srv.serve_forever()
        except KeyboardInterrupt:
            srv.shutdown()
        return 0
    elif args.task == "embed_frames":
        assert args.index and args.output_dir, "embed_frames needs --index/--output_dir"
        n = eng.export_frame_embeddings(args.index, args.output_dir)
        print(f"wrote {n} frame embeddings to {args.output_dir}")
        return 0
    elif args.task == "embed_text":
        if os.path.exists(args.texts):
            texts = [l.strip() for l in open(args.texts) if l.strip()]
        else:
            texts = [t for t in args.texts.split(";") if t]
        emb = eng.embed_texts(texts)
        np.savez(args.output, embeddings=emb, names=np.array(texts))
    else:
        paths = sorted(_glob.glob(args.inputs))
        labels = [l for l in args.labels.split(";") if l]
        assert paths and labels, "zero_shot needs --inputs and --labels"
        res = eng.zero_shot(
            eng.fbank_files(paths), {l: [f"{args.prompt}{l}"] for l in labels}
        )
        np.savez(
            args.output, scores=res["scores"], names=np.array(paths),
            classes=np.array(res["classes"]),
            prediction=np.array(res["prediction"]),
        )
        for p, c in zip(paths, res["prediction"]):
            print(f"{p}\t{c}")
    print(f"wrote {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
