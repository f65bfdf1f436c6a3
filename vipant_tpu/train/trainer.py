"""Base trainer — the TPU-native "monitor" (driver) layer.

Skeleton parity with the reference monitors (SURVEY.md §2.2): build data →
build model → optimizer with freeze partition → per-epoch hot loop with LR
warmup, periodic ``peep_rate`` logging (loss, samples/s, phase timers) and
``save_rate`` eval+checkpoint; ``infer`` accumulates features and reports
metrics (`/root/reference/cvap/monitor/cvap.py`).

Differences, on purpose: one SPMD program over the mesh instead of
DP/DDP process management; bf16 compute policy instead of AMP+GradScaler
(`/root/reference/cvap/monitor/cvap.py:104`); checkpoints carry optimizer
state + step so training resumes exactly (the reference re-initialized,
SURVEY.md §5).
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np

from ..ckpt import load_checkpoint, load_torch_file, save_checkpoint
from ..config import Config
from ..eval import symmetric_retrieval
from ..models import (
    build_main_model,
    init_model,
    port_model_from_clip,
    siamese_ties,
    tunable_mask,
)
from ..optim import build_optimizer
from ..optim.partition import partition_params
from ..parallel import make_mesh, replicate, shard_batch
from ..utils import AverageMeter, PhaseTimer, numel, seed_all_rng, setup_logger
from .state import TrainState
from .step import make_train_step

MONITORS: Dict[str, type] = {}

# Explicit "no gold report" marker for ``infer(gold_file=...)``: ``None``
# means "fall back to ``running.gold_file``" (the eval-split default), while
# SKIP_GOLD suppresses the fallback — used for the TEST pass so an unset
# ``gold_file_test`` never silently reports the *eval* split's gold file on
# test data (the reference derives the test gold file from ``test_name``,
# `/root/reference/cvap/monitor/cvap.py:246-272`).
SKIP_GOLD = "__skip_gold__"


def register_monitor(*names):
    def deco(cls):
        for n in names:
            MONITORS[n] = cls
        return cls
    return deco


def build_monitor(cfg, **kw):
    return MONITORS[cfg.monitor](cfg, **kw)


class Trainer:
    """Vision-audio (VA) pre-training driver — ``VAMonitor``
    (parity: `/root/reference/cvap/monitor/cvap.py`)."""

    batch_keys: Tuple[str, ...] = ("image", "audio")
    grad_cache_methods: Tuple[str, str] = ("encode_image", "encode_audio")

    def __init__(self, cfg: Config, echo=None):
        self.cfg = cfg
        seed_all_rng(int(cfg.seed))
        out_dir = os.path.join(str(cfg.alias_root), str(cfg.model_name))
        self.out_dir = out_dir
        self.echo = echo or setup_logger(out_dir, rank=jax.process_index(), verbose=bool(cfg.verbose))
        self.mesh = make_mesh(
            int(cfg.mesh.get("data", -1)),
            int(cfg.mesh.get("model", 1)),
            int(cfg.mesh.get("pipe", 1)),
            int(cfg.mesh.get("seq", 1)),
        )
        self._apply_pipeline_cfg()
        self.timer = PhaseTimer()
        self.eval_mode = bool(cfg.get("eval", False))
        self.global_step = 0
        self.run_id = f"{int(time.time())}-{os.getpid()}"  # metrics.jsonl rows

        self.timer.start("build")
        self.testloader = None  # monitors with a test split set this in build_data
        self.build_data()
        self.build_model()
        self.build_optimizer()
        self.timer.stop("build")
        self.echo.info(
            f"model params: {numel(self.state.params) + numel(self.state.frozen_params or {}):,} "
            f"(tunable {numel(self.state.params):,}) mesh {dict(self.mesh.shape)}"
        )

    def _apply_pipeline_cfg(self) -> None:
        """mesh.pipe > 1 or mesh.seq > 1: mark transformer-trunk towers as
        layer-stacked so the pipeline executor (parallel/pipeline.py) can
        shard whole layers over the pipe axis / the seq ring can shard_map
        the explicit param stack (parallel/sequence.py). Explicit per-head
        ``stacked`` settings win."""
        cfg = self.cfg
        pipe = int(cfg.mesh.get("pipe", 1))
        seq = int(cfg.mesh.get("seq", 1))
        assert pipe <= 1 or seq <= 1, "mesh.pipe and mesh.seq cannot combine"
        # seq>1 also runs through the stacked trunk (its shard_map needs the
        # explicit [L, ...] param stack, nn.layers.StackedTransformer)
        axis_name, axis = ("pipe", pipe) if pipe > 1 else ("seq", seq)
        pipe = max(pipe, seq)
        if pipe <= 1 or "model" not in cfg:
            return
        mb = cfg.mesh.get("microbatches", None)
        stacked_any = False
        for key in ("image", "image_v", "audio", "text"):
            head = cfg.model.get(key)
            if head is None or not hasattr(head, "get"):
                continue
            enc = head.get("encoder")
            if enc is None or str(enc.get("name", "")) != "TransformerBackbone":
                continue
            if head.get("stacked", None) is None:
                head["stacked"] = True
            stacked_any = stacked_any or bool(head.get("stacked"))
            if mb and head.get("pipe_microbatches", None) is None:
                head["pipe_microbatches"] = int(mb)
            # masked trunks (causal text, token packing) ring too: the 2D
            # additive mask's query rows shard over `seq` and each ring step
            # slices its key block locally (parallel/sequence.py
            # ring_attention bias support) — no replication warning needed.
        if not stacked_any:
            self.echo.info(
                f"mesh.{axis_name}={axis} but no transformer-trunk tower to "
                f"stack — the {axis_name} axis will only replicate compute"
            )

    # ------------------------------------------------------------------ data
    def loader_device_put(self, batch: Dict) -> Dict:
        """Runs in the loader thread: shard/upload batch arrays so H2D
        overlaps the previous step's compute (double buffering). Uses
        parallel.shard_batch, which assembles the cross-process global array
        on multi-host topologies."""
        from ..parallel import shard_batch as _shard

        from ..parallel import data_shard_info

        ndata = self.mesh.shape["data"] // data_shard_info(self.mesh)[1]
        arrays = {}
        for k in self.batch_keys:
            v = batch.get(k)
            if (
                v is not None
                and hasattr(v, "shape")
                and v.ndim >= 1
                and v.shape[0] % max(ndata, 1) == 0
            ):
                arrays[k] = v
        placed = _shard(arrays, self.mesh)
        batch.update(placed)
        return batch

    def build_data(self):
        from ..data import build_image_audio_dataloader
        from ..parallel import data_shard_info

        run = self.cfg.running
        # data-shard-GROUP coordinates, not raw process id: processes whose
        # devices replicate the data axis (model/pipe spanning hosts) must
        # load identical batches (parallel.mesh.data_shard_info)
        pid, np_ = data_shard_info(self.mesh)
        self.loader = (
            build_image_audio_dataloader(
                self.cfg, str(run.data_name), True, pid, np_,
                device_put_fn=self.loader_device_put,
            )
            if not self.eval_mode and run.get("data_name")
            else None
        )
        self.evalloader = (
            build_image_audio_dataloader(self.cfg, str(run.eval_name), False, 0, 1)
            if run.get("eval_name")
            else None
        )
        self.output_dim = None

    # ----------------------------------------------------------------- model
    def build_model(self):
        cfg = self.cfg
        self.model = build_main_model(cfg, output_dim=self.output_dim)
        variables = init_model(cfg, self.model, output_dim=self.output_dim)
        variables = self.load_pretrained(variables)
        self.ties = siamese_ties(cfg)
        from ..nn.tying import prune_tied

        params = prune_tied(variables["params"], self.ties)
        mask = tunable_mask(cfg, params, self.ties)
        self.trainable, self.frozen = partition_params(params, mask)
        self.batch_stats = variables.get("batch_stats")
        self.has_batch_stats = self.batch_stats is not None and len(jax.tree_util.tree_leaves(self.batch_stats)) > 0

    def load_pretrained(self, variables):
        """Init priority parity (`/root/reference/cvap/model/cvap.py:61-128`
        + `helper.py:52-63`): explicit checkpoint > "meme" DeiT weights >
        CLIP weights > random. CLIP still seeds the non-DeiT towers when a
        meme file covers only one tower."""
        cfg = self.cfg
        model_file = str(cfg.get("model_file", "") or "")
        ckpt_path = os.path.join(str(cfg.model_root), str(cfg.model_name), model_file)
        loaded_ckpt = False
        if model_file.endswith(".pth") and os.path.exists(ckpt_path):
            variables = self.load_reference_ckpt(variables, ckpt_path)
            loaded_ckpt = True
        elif model_file and os.path.isdir(ckpt_path):
            # native resume handled in build_optimizer (full state restore)
            # — counts as "checkpoint loaded" so the meme-DeiT port below
            # is skipped instead of being done and immediately overwritten
            loaded_ckpt = True
        elif model_file and not model_file.endswith(".out"):
            # a configured-but-missing checkpoint must not silently fall
            # back to random weights (.out manifests resolve later)
            raise FileNotFoundError(
                f"model_file {model_file!r} not found at {ckpt_path!r}"
            )
        clip_path = self._clip_path()
        if clip_path and not model_file:
            import torch  # noqa: F401  (porter dependency)

            _, sd = load_torch_file(clip_path)
            variables = port_model_from_clip(cfg, self.model, variables, sd)
            self.echo.info(f"initialized towers from CLIP weights {clip_path}")
        if not loaded_ckpt:
            variables = self.load_meme(variables)
        return variables

    def load_meme(self, variables):
        """"meme" DeiT init: when a tower is a DeiT and its config names a
        local ``meme_path`` weight file, port it over the tower's (random or
        CLIP-skipped) init — the reference's torch.hub DeiT load
        (`/root/reference/cvap/model/helper.py:52-63`,
        `cvap.py:100-110` with_meme priority). Zero-egress: ``meme_path``
        must be a local .pth in the timm DeiT layout."""
        from ..nn.deit import DeiTTower

        params = dict(variables["params"])
        changed = False
        for field in ("image", "audio"):
            mcfg = self.cfg.model.get(field) if "model" in self.cfg else None
            if mcfg is None:
                continue
            path = str(mcfg.get("meme_path", "") or "")
            tower = getattr(self.model, field, None)
            if not path or not isinstance(tower, DeiTTower):
                continue
            if not os.path.exists(path):
                # reference behavior: failed meme load warns and falls back
                # (`/root/reference/cvap/model/helper.py:57-62`)
                self.echo.warning(
                    f"failed to load the meme {mcfg.get('meme_name')!r} "
                    f"from {path!r}: not found; keeping current init"
                )
                continue
            from ..ckpt.deit_port import port_deit

            _, sd = load_torch_file(path)
            params[field] = port_deit(sd, tower)["params"]
            changed = True
            self.echo.info(f"initialized {field} tower from meme DeiT weights {path}")
        if changed:
            variables = {**variables, "params": params}
        return variables

    def _clip_path(self) -> Optional[str]:
        from ..ckpt.loading import clip_weights_path

        return clip_weights_path(self.cfg)

    def load_reference_ckpt(self, variables, path: str):
        from ..ckpt.loading import apply_reference_ckpt

        return apply_reference_ckpt(self.model, variables, path, echo=self.echo)

    # ------------------------------------------------------------- optimizer
    def _attn_heads_map(self) -> Dict[str, int]:
        from ..parallel.mesh import attn_heads_map

        return attn_heads_map(self.cfg.get("model"))

    def build_optimizer(self):
        cfg = self.cfg
        steps_per_epoch = len(self.loader) if self.loader is not None else 1
        self.steps_per_epoch = max(steps_per_epoch, 1)
        self.tx, self.lr_schedule = build_optimizer(cfg.optimizer, self.steps_per_epoch)
        with jax.sharding.set_mesh(self.mesh):
            if (
                int(self.mesh.shape.get("model", 1)) > 1
                or int(self.mesh.shape.get("pipe", 1)) > 1
            ):
                # Megatron-style weight sharding over the model axis: MLP
                # fc column / proj row splits AND attention qkv/out head-block
                # splits (the fused kernel consumes the local slices), and/or
                # layer sharding of stacked trunks over the pipe axis —
                # parallel.param_shardings
                from ..parallel import shard_params

                heads = self._attn_heads_map()
                trainable = shard_params(self.trainable, self.mesh, attn_heads=heads)
                frozen = (
                    shard_params(self.frozen, self.mesh, attn_heads=heads)
                    if self.frozen
                    else None
                )
            else:
                trainable = replicate(self.trainable, self.mesh)
                frozen = replicate(self.frozen, self.mesh) if self.frozen else None
            stats = replicate(self.batch_stats, self.mesh) if self.has_batch_stats else None
            self.state = TrainState.create(
                trainable,
                self.tx,
                frozen_params=frozen,
                batch_stats=stats,
                rng=jax.random.PRNGKey(int(cfg.seed)),
            )
            self.constrain_state = None
            if bool(cfg.mesh.get("zero", False)) and int(self.mesh.shape["data"]) > 1:
                # ZeRO-1: Adam/LARS moments shard 1/N over the data axis;
                # the step output is pinned to this placement so GSPMD
                # reduce-scatters grads into the sharded update and
                # all-gathers params once (parallel/zero.py)
                from ..parallel.zero import (
                    constrain_to,
                    state_placement,
                    zero_shard_opt_state,
                )

                self.state = self.state.replace(
                    opt_state=zero_shard_opt_state(self.state.opt_state, self.mesh)
                )
                self.constrain_state = constrain_to(state_placement(self.state))
                self.echo.info(
                    f"ZeRO-1: optimizer state sharded over the "
                    f"{int(self.mesh.shape['data'])}-way data axis"
                )
        # native resume
        model_file = str(cfg.get("model_file", "") or "")
        ckpt_path = os.path.join(str(cfg.model_root), str(cfg.model_name), model_file)
        if model_file and os.path.isdir(ckpt_path):
            self.state = load_checkpoint(ckpt_path, self.state)
            self.global_step = int(self.state.step)
            self.echo.info(f"resumed from {ckpt_path} at step {self.global_step}")
        gc = cfg.get("running", Config({})).get("grad_cache")
        if gc is not None and bool(gc.get("alive", False)):
            if getattr(self.model, "decoder", None) is not None:
                self.echo.info("gradient cache ignored: captioning has no contrastive loss")
                gc = None
            elif self.has_batch_stats:
                # an explicitly requested feature must not silently degrade
                raise ValueError(
                    "gradient_cache.alive=True is incompatible with models "
                    "carrying batch_stats (the two-pass encode cannot replay "
                    "mutable batch statistics); set gradient_cache.alive=False"
                )
        if gc is not None and bool(gc.get("alive", False)):
            from .step import make_grad_cache_step

            chunk = int(gc.get("chunk_size", 128))
            bsz = int(cfg.running.batch_size)
            # smallest chunk count with chunks ≤ chunk_size that divides the batch
            n_chunks = max(-(-bsz // max(chunk, 1)), 1)
            while bsz % n_chunks != 0:
                n_chunks += 1
            method_a, method_b = self.grad_cache_methods

            def _make_frontend(key):
                """Per-chunk device frontend for one modality (on-device
                fbank/SpecAugment for audio, uint8 normalize for images),
                running through the same device_frontend as the plain step."""
                if key == "audio" and not (
                    self.on_device_audio
                    or self.audio_int16_fbank
                    or self.audio_bf16_fbank
                ):
                    return None
                if key == "image" and not self.image_uint8:
                    return None
                if key not in ("audio", "image"):
                    return None
                idx = self.batch_keys.index(key)

                def fn(x, rng):
                    args = [None] * len(self.batch_keys)
                    args[idx] = x
                    full = self.device_frontend(tuple(args), {"augment": rng}, train=True)
                    return full[idx]

                return fn

            preprocess_a = _make_frontend(self.batch_keys[0])
            preprocess_b = _make_frontend(self.batch_keys[1])
            self.train_step = make_grad_cache_step(
                self.model,
                self.tx,
                n_chunks,
                method_a,
                method_b,
                ties=self.ties,
                preprocess_a=preprocess_a,
                preprocess_b=preprocess_b,
                constrain=self.constrain_state,
            )
            self.echo.info(
                f"gradient cache on: {n_chunks} chunks of {bsz // n_chunks}"
            )
        else:
            self.train_step = make_train_step(
                self.model,
                self.tx,
                ties=self.ties,
                has_batch_stats=self.has_batch_stats,
                loss_adapter=self.loss_adapter,
                donate=True,
                constrain=self.constrain_state,
            )

    # ---------------------------------------------------------------- batch
    def make_batch(self, batch: Dict[str, np.ndarray]) -> Tuple:
        """Collated dict → model args, sharded over the mesh (the H2D
        boundary; parity: `/root/reference/cvap/monitor/cvap.py:113-127`).
        Arrays already placed by the loader thread pass through."""
        arrays = tuple(batch[k] for k in self.batch_keys)
        if all(isinstance(a, jax.Array) for a in arrays):
            return arrays
        return shard_batch(arrays, self.mesh)

    # --- on-device frontends (waveform → fused fbank; uint8 → normalize) ---
    @property
    def on_device_audio(self) -> bool:
        run = self.cfg.get("running")
        return (
            run is not None
            and "audio" in run
            and bool(run.audio.get("on_device", False))
            and any(k.startswith("audio") for k in self.batch_keys)
        )

    @property
    def image_uint8(self) -> bool:
        run = self.cfg.get("running")
        return (
            run is not None
            and bool(run.get("image_uint8", False))
            and any(k.startswith("image") for k in self.batch_keys)
        )

    @property
    def audio_int16_fbank(self) -> bool:
        """Precomputed fbanks shipped as int16 (npz path, half the H2D
        bytes); dequantization runs in the device frontend."""
        run = self.cfg.get("running")
        return (
            run is not None
            and "audio" in run
            and bool(run.audio.get("ship_int16", False))
            and any(k.startswith("audio") for k in self.batch_keys)
        )

    @property
    def audio_bf16_fbank(self) -> bool:
        """Precomputed fbanks shipped as bf16 (npz path, half the H2D
        bytes, lossless vs the bf16-compute trunk); the device frontend
        upcasts to f32 (fused into the first conv by XLA)."""
        run = self.cfg.get("running")
        return (
            run is not None
            and "audio" in run
            and bool(run.audio.get("ship_bf16", False))
            and any(k.startswith("audio") for k in self.batch_keys)
        )

    @property
    def needs_device_frontend(self) -> bool:
        return (
            self.on_device_audio
            or self.image_uint8
            or self.audio_int16_fbank
            or self.audio_bf16_fbank
        )

    def _frontend_settings(self):
        from ..data.image_audio import fbank_params_from_cfg

        acfg = self.cfg.running.audio
        params = fbank_params_from_cfg(acfg)
        norms = tuple(acfg.get("norms", []) or []) or None
        freq_p, time_p = 0, 0
        if bool(acfg.get("transform_fbank", False)):
            for entry in acfg.get("fbank_transforms", []) or []:
                if entry[0] == "FrequencyMasking":
                    freq_p = int(entry[1][0])
                elif entry[0] == "TimeMasking":
                    time_p = int(entry[1][0])
        return params, int(self.cfg.running.max_audio_len), norms, freq_p, time_p

    def device_frontend(self, args: Tuple, rngs, train: bool = True) -> Tuple:
        """Waveform → normalized log-mel (+ SpecAugment at train) and
        uint8 image → CLIP normalization, inside the jitted step — the fused
        TPU-native frontend. Applies to EVERY image-/audio-kind batch key
        (``image``, ``image_v1``, ``audio_v2``, …): the siamese monitor's
        view streams go through the same pipeline as the pivots."""
        import jax.numpy as jnp

        out = list(args)
        audio_salt = 0
        for i, key in enumerate(self.batch_keys):
            x = out[i]
            if x is None or not hasattr(x, "dtype"):
                continue
            if key.startswith("image"):
                if x.dtype == jnp.uint8:
                    from ..data.transforms_image import device_normalize_image

                    out[i] = device_normalize_image(x)
            elif key.startswith("audio"):
                # distinct SpecAugment masks per audio view (salt), same
                # featurization
                out[i] = self._frontend_audio(x, rngs, train, salt=audio_salt)
                audio_salt += 1
        return tuple(out)

    def _frontend_audio(self, wav, rngs, train: bool, salt: int = 0):
        """One audio stream through the device frontend: int16-fbank
        dequantization, or raw-PCM/float waveform → fbank (+ SpecAugment
        at train)."""
        from ..ops.fbank import fbank_fixed_len

        import jax.numpy as jnp

        if wav.ndim == 4 and wav.dtype == jnp.int16:
            # int16-quantized precomputed fbank [B, 1, T, M] — dequantize
            from ..data.image_audio import FBANK_INT16_SCALE

            return wav.astype(jnp.float32) * (1.0 / FBANK_INT16_SCALE)
        if wav.ndim == 4 and wav.dtype == jnp.bfloat16:
            # bf16-shipped precomputed fbank — upcast fuses into the first
            # patchify matmul (lossless vs fp32 shipping: the tower computes
            # in bf16 anyway)
            return wav.astype(jnp.float32)
        if wav.ndim != 2:  # already featurized
            return wav
        params, max_len, norms, freq_p, time_p = self._frontend_settings()
        if wav.dtype == jnp.int16:  # raw PCM shipped to cut H2D in half
            # the host zero-means over the TRUE clip length before
            # padding/quantization (image_audio._audio_waveform) — the
            # device-side mean over the padded length therefore only
            # removes the sub-LSB quantization DC (a padded-length mean of
            # a non-zero-meaned clip would mis-scale the DC correction)
            wav = wav.astype(jnp.float32) * (1.0 / 32767.0)
            if bool(self.cfg.running.audio.get("zero_mean_wf", True)):
                wav = wav - jnp.mean(wav, axis=-1, keepdims=True)
        feats = fbank_fixed_len(wav, params, max_len, norms=norms)
        if train and (freq_p or time_p) and rngs:
            import jax as _jax

            from ..ops import freq_mask, time_mask

            key = _jax.random.fold_in(next(iter(rngs.values())), 17 + salt)
            kf, kt = _jax.random.split(key)
            if freq_p:
                feats = freq_mask(kf, feats, freq_p)
            if time_p:
                feats = time_mask(kt, feats, time_p)
        return feats[:, None]  # [B, 1, T, M]

    def eval_frontend_args(self, batch) -> Tuple:
        """Batch dict → model args for eval, routed through the device
        frontend when waveform/uint8 shipping is active (every eval path
        must use this — feeding raw waveforms to encode_* silently hits the
        precomputed-embedding passthrough)."""
        args = tuple(batch.get(k) for k in self.batch_keys)
        if self.needs_device_frontend:
            # jitted (memoized): the fbank/normalize ops fuse into one
            # compiled program instead of eager per-op dispatches per batch
            fn = self.memo(
                "eval_frontend",
                lambda: jax.jit(lambda a: self.device_frontend(a, None, train=False)),
            )
            args = fn(args)
        return args

    def loss_adapter(self, model, variables, batch, rngs):
        if self.needs_device_frontend:
            batch = self.device_frontend(batch, rngs, train=True)
        mutable = ["batch_stats"] if self.has_batch_stats else False
        return model.apply(variables, *batch, train=True, rngs=rngs, mutable=mutable)

    # ---------------------------------------------------------------- learn
    def learn(self):
        run = self.cfg.get("running")
        if (
            run is not None
            and "audio" in run
            and bool(run.audio.get("eval_norms", False))
        ):
            # dataset fbank-statistics job
            # (parity: `/root/reference/cvap/monitor/cvap.py:43-65`)
            return self.eval_norms(self.evalloader or self.loader)
        if self.eval_mode:
            report = self.infer(
                self.evalloader, samples=self._samples_cap("eval_samples")
            )
            self.echo.info(report)
            return report
        run = self.cfg.running
        epochs = int(run.epochs)
        # mid-epoch exact resume: a restored global_step fast-forwards to
        # the right epoch and batch offset of the deterministic epoch order
        # (the reference restarted from scratch — SURVEY.md §5 "resume is
        # really initialize-from")
        start_epoch, skip = divmod(self.global_step, self.steps_per_epoch)
        if skip and start_epoch < epochs:
            self.echo.info(
                f"resuming mid-epoch: epoch {start_epoch}, skipping {skip} batches"
            )
        for ie in range(start_epoch, epochs):
            if self.loader is not None:
                self.loader.set_epoch(ie, start_batch=skip if ie == start_epoch else 0)
            self.epoch(ie)
            if bool(run.get("save_epoch", False)):
                self.save()
                # gate the epoch-boundary eval on the last step's loss just
                # like the in-loop save path: the reference's save_epoch eval
                # runs inside the step loop and (for CLAP) stays CE-gated
                # (`/root/reference/cvap/monitor/clap.py:245,256`)
                last = getattr(self, "_last_metrics", None)
                self.mid_train_evals(
                    float(last["loss"]) if last is not None else float("-inf")
                )
        if bool(self.cfg.get("async_ckpt", False)):
            from ..ckpt.orbax_io import wait_for_saves

            wait_for_saves()  # commit the last in-flight save before exit

    def epoch(self, ie: int):
        run = self.cfg.running
        peep_rate = int(run.get("peep_rate", 100))
        save_rate = int(float(run.get("save_rate", 1e9)))
        prof = self.cfg.get("profile")
        prof_on = prof is not None and bool(prof.get("alive", False))
        halt_on_nan = bool(self.cfg.get("halt_on_nan", True))
        # the reference forces an eval+save at the exact step warmup reaches
        # the base lr (SGDR recommendation,
        # `/root/reference/cvap/monitor/clap.py:190-200`) — non-LARS path only
        opt = self.cfg.get("optimizer")
        warmup_done_step = -1
        milestone_steps: set = set()
        if opt is not None and not bool(opt.get("use_lars", False)):
            if bool(opt.get("warmup", False)):
                warmup_done_step = int(opt.get("warmup_steps", 0))
            if bool(opt.get("batch_sch", False)):
                # the reference also forces an eval when a per-batch
                # MultiStepLR crosses a milestone
                # (`/root/reference/cvap/monitor/audioset_clf.py:263-270`)
                milestone_steps = {
                    int(m) * self.steps_per_epoch for m in (opt.get("steps", []) or [])
                }
        meter = AverageMeter(window=peep_rate)
        # per-component running losses for composite loss heads — the
        # reference's `stats()` peep breakdown (va/lv/al, vp/ap/va/vv/aa,
        # ce/bce; `/root/reference/cvap/module/decoder/loss_head.py:453-457`).
        # Sampled at peep cadence so no extra device syncs are added.
        comp_meters: Dict[str, AverageMeter] = {}
        nsample = 0
        t_epoch = time.time()
        self.timer.start("data")
        with jax.sharding.set_mesh(self.mesh):
            for batch in self.loader:
                args = self.make_batch(batch)
                self.timer.stop("data")
                self.timer.start("model")
                if prof_on and self.global_step + 1 == int(prof.get("start_step", 10)):
                    jax.profiler.start_trace(str(prof.get("dir", "/tmp/vipant_profile")))
                self.state, metrics = self.train_step(self.state, *args)
                self._last_metrics = metrics  # lazy ref, no device sync
                self.global_step += 1
                if prof_on and self.global_step == int(prof.get("start_step", 10)) + int(
                    prof.get("num_steps", 5)
                ):
                    jax.block_until_ready(metrics["loss"])
                    jax.profiler.stop_trace()
                    self.echo.info(f"profiler trace written to {prof.get('dir')}")
                bsz = len(batch["name"])
                nsample += bsz
                self.timer.stop("model")

                if self.global_step % peep_rate == 0:
                    loss = float(metrics["loss"])  # host read (sync point)
                    if not np.isfinite(loss):
                        self.echo.error(
                            f"non-finite loss {loss} at step {self.global_step}"
                        )
                        if halt_on_nan:
                            raise FloatingPointError(
                                f"loss became {loss} at step {self.global_step}"
                            )
                    meter.update(loss)
                    comp = ""
                    for k in sorted(metrics):
                        if k.startswith("loss_"):
                            m = comp_meters.setdefault(k, AverageMeter(window=peep_rate))
                            m.update(float(metrics[k]))
                            comp += f"{k[5:]} {m.avg:.3f} "
                    lr = float(self.lr_schedule(self.global_step))
                    dt = time.time() - t_epoch
                    self.echo.info(
                        f"epoch {ie} step {self.global_step} loss {loss:.4f} "
                        f"(avg {meter.avg:.4f}) {comp}lr {lr:.2e} "
                        f"{nsample / dt:.1f} samples/s ({self.timer.summary()})"
                    )
                    if bool(self.cfg.get("metrics_jsonl", False)) and (
                        jax.process_index() == 0
                    ):
                        # machine-readable telemetry beside the rank logs
                        # (beyond reference: its only sink was train_0.out).
                        # `run` disambiguates rows re-logged after a
                        # crash-resume; non-finite values become null so
                        # every line stays RFC-8259 JSON.
                        import json as _json

                        fin = lambda v: float(v) if np.isfinite(v) else None
                        with open(
                            os.path.join(self.out_dir, "metrics.jsonl"), "a"
                        ) as f:
                            f.write(_json.dumps({
                                "run": self.run_id,
                                "ts": time.time(),
                                "epoch": ie,
                                "step": self.global_step,
                                "loss": fin(loss),
                                "loss_avg": fin(meter.avg),
                                "lr": fin(lr),
                                "samples_per_sec": nsample / max(dt, 1e-9),
                            }) + "\n")
                force_eval = (
                    self.global_step == warmup_done_step
                    or self.global_step in milestone_steps
                )
                if force_eval or (save_rate > 0 and self.global_step % save_rate == 0):
                    # loss may not have been read this step (peep and save
                    # cadences are independent) — read it here for the gate
                    loss = float(metrics["loss"])
                    self.save()
                    self.mid_train_evals(loss)
                self.timer.start("data")
        self.timer.stop("data")
        self.echo.info(
            f"epoch {ie} done: {nsample} samples in {time.time() - t_epoch:.1f}s"
        )

    # ---------------------------------------------------------------- eval
    def _samples_cap(self, key: str) -> Optional[float]:
        """``running.eval_samples`` / ``running.test_samples`` budget, or
        None when unset/inf/non-positive (= evaluate everything)."""
        run = self.cfg.get("running")
        v = run.get(key) if run is not None else None
        if v is None:
            return None
        v = float(v)
        return v if np.isfinite(v) and v > 0 else None

    def _eval_all_cap(self) -> Optional[float]:
        """Sample budget for the evaluate-all-checkpoints pass
        (``repeated_retrieval`` / ``repeated_zero_shot``). The reference
        scored the full eval split per checkpoint; here the per-save
        ``eval_samples`` budget applies by default, but it is its own knob —
        set ``running.eval_all_samples`` (inf/0 = uncapped) to restore
        full-split terminal reports without touching the per-save budget."""
        run = self.cfg.get("running")
        if run is not None and run.get("eval_all_samples") is not None:
            return self._samples_cap("eval_all_samples")
        cap = self._samples_cap("eval_samples")
        if cap is not None:
            self.echo.info(
                f"eval-all pass capped at {int(cap)} samples per checkpoint "
                f"(running.eval_samples; set running.eval_all_samples=inf "
                f"for full-split reports)"
            )
        return cap

    def _optional_test_loader(self, factory, name):
        """Build the test-split loader, tolerating a missing split — the
        reference checks on-disk existence and silently sets
        ``testloader=None`` (`/root/reference/cvap/monitor/cvalp.py:97-104`,
        `/root/reference/cvap/monitor/clap.py:105-111`); we echo a warning
        instead of a fully silent skip."""
        try:
            return factory()
        except (FileNotFoundError, OSError) as e:
            # ONLY missing-split signals — a ValueError/KeyError here is a
            # real configuration error (e.g. the pak dataset's norms/dtype
            # guards) and must fail loud, not degrade to a skipped TEST pass
            self.echo.info(f"test split '{name}' unavailable, skipping: {e}")
            return None

    def _warn_gold_unused(self, gold_file) -> None:
        """Monitors without a gold P/R report accept ``gold_file`` for the
        uniform ``infer`` signature; a configured-but-unsupported gold file
        should be surfaced, not silently dropped."""
        if gold_file and gold_file != SKIP_GOLD and not getattr(self, "_gold_warned", False):
            self._gold_warned = True
            self.echo.info(
                f"gold_file '{gold_file}' is not supported by {type(self).__name__}; ignored"
            )

    def mid_train_evals(self, loss: float) -> None:
        """Save-time eval of the evalloader AND (when configured) the
        testloader, each under its sample budget (parity:
        `/root/reference/cvap/monitor/cvalp.py:240-264`,
        `/root/reference/cvap/monitor/clap.py:245-262`,
        `/root/reference/cvap/monitor/audioset_clf.py:300-321` — the
        reference runs both loaders at every save; CLAP gates both on the
        CE bound, see ``mid_train_eval_ok``)."""
        if not self.mid_train_eval_ok(loss):
            # a long run whose loss never crosses the gate would otherwise
            # be silently eval-free — say so at each suppressed save
            self.echo.info(
                f"save-time eval skipped: loss {loss:.3f} above the eval "
                f"gate (running.eval_loss_bound, see mid_train_eval_ok)"
            )
            return
        if self.evalloader is not None:
            self.echo.info(
                self.infer(self.evalloader, samples=self._samples_cap("eval_samples"))
            )
        if self.testloader is not None:
            gold = self.cfg.running.get("gold_file_test")
            self.echo.info(
                "TEST "
                + self.infer(
                    self.testloader,
                    samples=self._samples_cap("test_samples"),
                    gold_file=gold if gold else SKIP_GOLD,
                )
            )

    def mid_train_eval_ok(self, loss: float) -> bool:
        """Hook gating the periodic mid-training eval on the current loss.
        The base trainer always evals; the AT fine-tune trainer skips while
        the CE is still too large (see ``LATrainer``)."""
        return True

    def memo(self, name: str, builder):
        """Per-trainer memoization for jitted closures — a fresh jit
        closure per call would recompile on every eval."""
        cache = getattr(self, "_memo_cache", None)
        if cache is None:
            cache = self._memo_cache = {}
        if name not in cache:
            cache[name] = builder()
        return cache[name]

    def collect_features(self, loader, samples: Optional[float] = None) -> Dict[str, np.ndarray]:
        """Encode the loader's items; ``samples`` caps the number of items
        (the reference's ``eval_samples``/``test_samples`` budgets — it
        breaks once the count reaches the cap, overshooting by at most one
        batch: `/root/reference/cvap/monitor/cvap.py:252-254`)."""
        from .step import make_eval_step

        # ties=(): eval_variables() below already restores tied params —
        # restoring again inside the jitted step would be redundant work
        # and a second place tie handling must stay consistent
        eval_step = self.memo("eval_step", lambda: make_eval_step(self.model))
        feats: Dict[str, List[np.ndarray]] = {}
        names: List[str] = []
        variables = self.eval_variables()
        with jax.sharding.set_mesh(self.mesh):
            for batch in loader:
                if samples is not None and len(names) >= samples:
                    break
                # jitted memoized frontend — NOT eager device_frontend
                # (dozens of per-op dispatches per eval batch)
                args = self.eval_frontend_args(batch)
                out = eval_step(variables, *args)
                n_items = len(batch["name"])
                n_true = int(batch.get("_count", n_items))
                for key, val in zip(("x1", "x2", "x3"), out if isinstance(out, tuple) else (out,)):
                    if val is not None:
                        arr = np.asarray(val)
                        if n_true < n_items:  # drop pad rows (k per item)
                            per_item = arr.shape[0] // n_items
                            arr = arr[: n_true * per_item]
                        feats.setdefault(key, []).append(arr)
                names.extend(batch["name"][:n_true])
        return {k: np.concatenate(v) for k, v in feats.items()} | {"names": names}

    def eval_variables(self):
        from ..nn.tying import restore_tied

        params = self.state.full_params()
        if self.ties:
            params = restore_tied(params, self.ties)
        variables = {"params": params}
        if self.has_batch_stats:
            variables["batch_stats"] = self.state.batch_stats
        return variables

    def infer(self, loader, samples=None, gold_file=None) -> str:
        """Paired retrieval eval (I↔A) — the VA report, plus per-class
        precision/recall when a gold file is configured
        (parity: `/root/reference/cvap/monitor/cvap.py:246-272` +
        `/root/reference/cvap/module/decoder/loss_head.py:109-231`)."""
        self.timer.start("report")
        data = self.collect_features(loader, samples=samples)
        sym = symmetric_retrieval(data["x1"], data["x2"])
        n = data["x1"].shape[0]
        msg = ""
        if gold_file is None:
            gold_file = self.cfg.running.get("gold_file") if "running" in self.cfg else None
        elif gold_file == SKIP_GOLD:
            gold_file = None
        if gold_file:
            msg = " " + self._gold_report(data, gold_file)
        self.timer.stop("report")
        from ..eval.metrics import format_retrieval_report

        return format_retrieval_report(sym, n) + msg

    def _gold_report(self, data, gold_file: str) -> str:
        """Per-class P/R/mAP via label clustering from a gold JSONL index
        (records ``{"id", "labels": [...]}``)."""
        import json

        from ..eval import grouped_pnr

        classname_by_sample = {}
        with open(gold_file) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                rec = json.loads(line)
                classname_by_sample[rec["id"]] = ",".join(sorted(rec.get("labels", [])))
        names = data["names"]
        present = [nm for nm in names if nm in classname_by_sample]
        if len(present) != len(names):
            return "(gold file does not cover eval samples)"
        sample_by_classname: Dict[str, List[str]] = {}
        for nm in names:
            sample_by_classname.setdefault(classname_by_sample[nm], []).append(nm)
        x1 = data["x1"] / np.linalg.norm(data["x1"], axis=-1, keepdims=True)
        x2 = data["x2"] / np.linalg.norm(data["x2"], axis=-1, keepdims=True)
        order_12 = np.argsort(-(x1 @ x2.T), axis=1)
        order_21 = np.argsort(-(x2 @ x1.T), axis=1)
        m12 = grouped_pnr(order_12, names, classname_by_sample, sample_by_classname)
        m21 = grouped_pnr(order_21, names, classname_by_sample, sample_by_classname)
        return (
            f"| I->A P@1 {m12['P@1']:2.2f} mAP {m12['mAP']:2.2f} "
            f"A->I P@1 {m21['P@1']:2.2f} mAP {m21['mAP']:2.2f}"
        )

    # ----------------------------------------------------------------- save
    def collect_model_export(self) -> Optional[Dict]:
        """Reference-compat weight export: audio+loss for bimodal
        (parity: `/root/reference/cvap/model/cvap.py:42-46`)."""
        params = self.state.full_params()
        return {k: params[k] for k in ("audio", "loss") if k in params}

    def save(self):
        """Collective checkpoint save: EVERY process calls this together
        (Orbax writes per-process shards; process 0 finalizes + writes the
        host-side extras). Reference behavior scaled:
        `/root/reference/cvap/monitor/cvap.py:274-281` rank-0 torch.save."""
        ckpt_dir = os.path.join(str(self.cfg.alias_root), str(self.cfg.model_name))
        export = self.collect_model_export()
        path = save_checkpoint(
            ckpt_dir,
            self.global_step,
            self.state,
            cfg=self.cfg,
            model_only=export,
            keep_last=int(self.cfg.get("keep_last_ckpts", 0) or 0),
            async_save=bool(self.cfg.get("async_ckpt", False)),
        )
        if bool(self.cfg.get("export_pth", False)) and export:
            # reference-consumable tuple checkpoint beside the Orbax state
            # (`/root/reference/cvap/monitor/cvap.py:274-281` naming)
            from ..ckpt.orbax_io import host_local_tree
            from ..ckpt.reference_export import export_reference_pth

            export_host = host_local_tree(export)  # collective gather
            if jax.process_index() == 0:
                try:
                    pth = export_reference_pth(
                        os.path.join(path, f"{self.global_step:08d}.pth"),
                        export_host,
                        cfg=self.cfg,
                    )
                    self.echo.info(f"exported reference-format checkpoint {pth}")
                except Exception as e:  # ResNet/DeiT towers have no .pth mapping
                    self.echo.warning(f"reference .pth export skipped: {e}")
        self.echo.info(f"saving the checkpoint to {path}")

    def eval_norms(self, loader) -> Tuple[float, float]:
        """Dataset fbank statistics job
        (parity: `/root/reference/cvap/monitor/cvap.py:43-65`)."""
        total, total_sq, count = 0.0, 0.0, 0
        for batch in loader:
            a = batch["audio"]
            # pad_last eval loaders repeat the final item to the fixed
            # batch shape; statistics must not count the padding rows
            n_true = int(batch.get("_count", a.shape[0]))
            a = a[:n_true]
            total += float(a.sum())
            total_sq += float((a ** 2).sum())
            count += a.size
        mean = total / count
        std = float(np.sqrt(total_sq / count - mean ** 2))
        self.echo.info(f"fbank norms: mean {mean:.8f} std {std:.8f}")
        return mean, std


register_monitor("VAMonitor")(Trainer)
