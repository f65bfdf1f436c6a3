"""Vision-audio (VA) pre-training datasets + collator + builder.

Index convention parity with the reference
(`/root/reference/cvap/data/image_audio.py`): JSONL records
``{"id", "dir", "aclip": [ext], <frame_key>: ext | [exts]}``; media at
``{data_root}/{dir}/{aclip|frame_key}/{id}.{ext}``. Supports raw wav+jpg
("src"), precomputed-fbank npz ("npz"), precomputed frame embeddings, the
random-frame-at-train / middle-frame-at-eval policy, graceful degradation to
a random image on corrupt files, and the two-view siamese variant.
"""

from __future__ import annotations

import os
import warnings
from typing import Any, Dict, List, Optional

import numpy as np
from PIL import Image as PILImage

from ..ops.fbank_np import FbankParams
from .indexfile import eval_sample_limit, load_jsonl, shard_for_host
from .loader import DataLoader
from .transforms_audio import extract_fbank_features, make_transform
from .transforms_image import SharedImageTransform, clip_preprocess


def fbank_params_from_cfg(acfg, sample_rate: int = 16000) -> FbankParams:
    return FbankParams(
        sample_rate=int(acfg.get("sample_rate", sample_rate)),
        frame_shift_ms=float(acfg.get("frame_shift", 10)),
        frame_length_ms=float(acfg.get("frame_length", 25)),
        num_mel_bins=int(acfg.get("num_mel_bins", 128)),
        window_type=str(acfg.get("window_type", "hanning")),
        dither=float(acfg.get("dither", 0.0)),
        htk_compat=bool(acfg.get("htk_compat", True)),
        use_energy=bool(acfg.get("use_energy", False)),
    )


class ImageAudioDatasetSrc:
    """Raw wav + frame dataset
    (parity: `/root/reference/cvap/data/image_audio.py:104-219`)."""

    def __init__(self, cfg, data_name: str, train: bool):
        self.cfg = cfg
        self.train = train
        index = os.path.join(cfg.data_root, f"{data_name}.jsonl")
        limit = None if train else eval_sample_limit(cfg.get("eval_samples"))
        self.records = load_jsonl(index, limit=limit)
        if train and 0.0 < float(cfg.get("train_samples", 1.0)) < 1.0:
            k = int(len(self.records) * float(cfg.train_samples))
            order = np.random.permutation(len(self.records))[:k]
            self.records = [self.records[i] for i in order]
        if not self.records:
            raise ValueError(
                f"no records in `{index}` (empty or fully-filtered index)"
            )
        self.aclip_key = "clip" if "clip" in self.records[0] else "aclip"
        self.frame_key = cfg.get("frame_key", "frame")
        acfg = cfg.audio
        self.params = fbank_params_from_cfg(acfg)
        self.norms = tuple(acfg.get("norms", []) or []) or None
        self.transform_audio, self.transform_fbank = make_transform(acfg)
        self.acfg = acfg
        # on-device featurization: the item path stops at a fixed-length
        # cropped waveform; fbank + SpecAugment run inside the jitted train
        # step, fused with the model (the TPU-native frontend)
        self.on_device = bool(acfg.get("on_device", False))
        # ship uint8 images; CLIP normalization runs on device
        self.image_uint8 = bool(cfg.get("image_uint8", False))

    def __len__(self) -> int:
        return len(self.records)

    def _paths(self, index: int):
        rec = self.records[index]
        sub = rec.get("dir", "")
        sub = f"{sub}/" if sub else ""
        name = rec["id"]
        aclip = rec[self.aclip_key]
        aclip = aclip[0] if isinstance(aclip, list) else aclip
        aclip_file = f"{self.cfg.data_root}/{sub}{self.aclip_key}/{name}.{aclip}"

        frame = rec.get(self.frame_key)
        frame_emb_file = None
        if frame is None:
            frame_file = None
        elif isinstance(frame, str):
            frame_file = f"{self.cfg.data_root}/{sub}{self.frame_key}/{name}.{frame}"
            if self.cfg.get("frame_emb") is not None:
                stem = frame.rsplit(".", 1)[0]
                frame_emb_file = f"{self.cfg.data_root}/{self.cfg.frame_emb}/{name}.{stem}.npz"
        else:
            idx = (
                int(np.random.choice(len(frame)))
                if self.train
                else int(np.ceil(len(frame) / 2)) - 1
            )
            frame_file = f"{self.cfg.data_root}/{sub}{self.frame_key}/{name}.{frame[idx]}"
            if self.cfg.get("frame_emb") is not None:
                stem = frame[idx].rsplit(".", 1)[0]
                frame_emb_file = f"{self.cfg.data_root}/{self.cfg.frame_emb}/{name}.{stem}.npz"
        return name, aclip_file, frame_file, frame_emb_file

    def _open_image(self, fname: str):
        """Fully-decoded PIL image with the corrupt-file → random-image
        fallback (shared so the siamese path decodes each frame jpeg
        exactly once; ``load()`` forces the decode — PIL ``open`` only
        reads the header, so truncation errors would otherwise surface
        later, outside this fallback)."""
        res = int(self.cfg.get("resolution", 224))
        try:
            img = PILImage.open(fname)
            img.load()
            return img
        except Exception as e:  # corrupt → random image, keep training
            warnings.warn(f"use random image because `{e}` {fname}")
            return PILImage.fromarray(
                (np.random.rand(res, res, 3) * 256).astype(np.uint8)
            )

    def _image(self, fname: Optional[str], img=None) -> np.ndarray:
        from .transforms_image import clip_preprocess_uint8

        res = int(self.cfg.get("resolution", 224))
        pre = clip_preprocess_uint8 if self.image_uint8 else clip_preprocess
        if fname is None and img is None:
            return np.zeros(
                (3, res, res), np.uint8 if self.image_uint8 else np.float32
            )
        if img is None:
            img = self._open_image(fname)
        return pre(img, res)

    def _image_emb(self, fname: str) -> np.ndarray:
        try:
            return np.load(fname)["v"].astype(np.float32)
        except Exception as e:
            warnings.warn(f"use random embedding because `{e}` {fname}")
            return np.random.rand(int(self.cfg.embed_dim)).astype(np.float32)

    def _audio(self, fname: str) -> np.ndarray:
        if self.on_device:
            return self._audio_waveform(fname)
        return extract_fbank_features(
            fname,
            self.params,
            max_audio_len=int(self.cfg.max_audio_len),
            train=self.train,
            zero_mean_wf=bool(self.acfg.get("zero_mean_wf", True)),
            tile_audio=bool(self.acfg.get("tile_audio", False)),
            transform_audio=self.transform_audio if self.train else None,
            norms=self.norms,
            transform_fbank=self.transform_fbank if self.train else None,
        )

    def _audio_waveform(self, fname: str) -> np.ndarray:
        """Decode + crop + zero-mean to a fixed sample count; featurization
        happens on device.

        With ``audio.wav_int16`` (and no waveform augmentations pending) the
        clip zero-means on the host (true length, before padding), ships as
        raw int16 — half the H2D bytes — and the device frontend rescales
        and removes the residual sub-LSB quantization DC."""
        from .transforms_audio import random_crop
        from .wav import read_wav

        wav, sr = read_wav(fname)
        wav = wav[:1]
        if self.train:
            for t in self.transform_audio or []:
                wav = t(wav)
        desired = int((float(self.cfg.max_audio_len) / 100 + 0.05) * sr)
        wav = random_crop(wav, desired, train=self.train)
        # int16 shipping only when no waveform augmentation ran: augmented
        # samples can exceed [-1, 1] and would be hard-clipped by the
        # quantization, silently diverging from the f32 path
        augmented = self.train and bool(self.transform_audio)
        if bool(self.acfg.get("wav_int16", False)) and not augmented:
            # zero-mean BEFORE padding/quantization, exactly like the f32
            # branch below: a device-side mean over the zero-padded fixed
            # length would scale the DC correction by n_true/desired and
            # turn the pad tail into a nonzero constant
            if bool(self.acfg.get("zero_mean_wf", True)):
                wav = wav - wav.mean()
            out = np.zeros((desired,), np.int16)
            n = min(desired, wav.shape[-1])
            out[:n] = np.clip(np.round(wav[0, :n] * 32767.0), -32768, 32767).astype(np.int16)
            return out
        if bool(self.acfg.get("zero_mean_wf", True)):
            wav = wav - wav.mean()
        out = np.zeros((desired,), np.float32)
        n = min(desired, wav.shape[-1])
        out[:n] = wav[0, :n]
        return out

    def __getitem__(self, index: int) -> Dict[str, Any]:
        name, aclip_file, frame_file, frame_emb_file = self._paths(index)
        image = (
            self._image_emb(frame_emb_file)
            if frame_emb_file is not None
            else self._image(frame_file)
        )
        audio = self._audio(aclip_file)
        return {"image": image, "audio": audio, "name": name}


# int16 quantization scale for shipping NORMALIZED fbanks (~N(0,1) after
# mean/std): resolution 1/256 ≈ 0.004σ, range ±128σ — halves the npz
# path's H2D audio bytes; the device frontend dequantizes
FBANK_INT16_SCALE = 256.0


# dtypes that ship to the device as-is (converted inside the jitted step);
# ml_dtypes is a hard dependency of jax itself, so a plain import is fine
import ml_dtypes

_SHIP_DTYPES = (np.dtype(np.uint8), np.dtype(np.int16), np.dtype(ml_dtypes.bfloat16))


class ImageAudioDatasetNpz(ImageAudioDatasetSrc):
    """Precomputed-fbank npz dataset (the reference's throughput path,
    `/root/reference/cvap/data/image_audio.py:27-88`): each record's audio
    npz holds the log-mel matrix under "flag"/"feat" keys.

    ``running.audio.ship_int16``: quantize the normalized fbank to int16 on
    the host (scale :data:`FBANK_INT16_SCALE`); dequantization runs inside
    the jitted step — half the H2D bytes on the precomputed path.

    ``running.audio.ship_bf16``: ship the normalized fbank as bfloat16 —
    also half the bytes, but LOSSLESS w.r.t. training math (the towers
    compute in bf16, so the cast happens anyway) and far cheaper on the
    host than int16 quantization: one SIMD round-to-nearest-even pass per
    item vs multiply+rint+clip+cast, and the batch stack moves half the
    bytes. Preferred over ship_int16 wherever the trunk runs bf16."""

    def _audio(self, fname: str) -> np.ndarray:
        stem = fname.rsplit(".", 1)[0]
        data = np.load(stem + ".npz")
        key = "feat" if "feat" in data.files else data.files[0]
        # the npz decompress buffer is freshly owned — convert/normalize
        # without extra copies (host memcpy is the e2e bottleneck on the
        # 1-CPU bench box, docs/performance.md e2e decomposition)
        feats = data[key].astype(np.float32, copy=False)
        max_len = int(self.cfg.max_audio_len)
        if self.train and feats.shape[0] > max_len:
            start = np.random.randint(0, feats.shape[0] - max_len + 1)
            feats = feats[start : start + max_len]
        feats = feats[:max_len]
        if feats.shape[0] < max_len:
            feats = np.pad(feats, ((0, max_len - feats.shape[0]), (0, 0)))
        if self.norms is not None:
            np.subtract(feats, np.float32(self.norms[0]), out=feats)
            np.divide(feats, np.float32(self.norms[1]), out=feats)
        if self.train and self.transform_fbank:
            for t in self.transform_fbank:
                feats = t(feats)
        if bool(self.acfg.get("ship_bf16", False)):
            import ml_dtypes

            return feats.astype(ml_dtypes.bfloat16)
        if bool(self.acfg.get("ship_int16", False)):
            np.multiply(feats, np.float32(FBANK_INT16_SCALE), out=feats)
            np.rint(feats, out=feats)
            np.clip(feats, -32768, 32767, out=feats)
            return feats.astype(np.int16)
        return feats.astype(np.float32, copy=False)


class ImageAudioDatasetSiameseSrc(ImageAudioDatasetSrc):
    """Two views of image and audio for siamese training
    (parity: `/root/reference/cvap/data/image_audio.py:224-305`): both
    audio views come from ONE fbank extraction (same crop/augs) through
    :class:`FbankViews` (hardcoded AudioSet normalization + asymmetric
    SpecAugment masks), and the second image/audio view is produced only
    when the corresponding ``vv``/``aa`` loss flag is on (otherwise a
    [1, 1, 1] sentinel ships, exactly like the reference)."""

    def __init__(self, cfg, data_name: str, train: bool, loss_flags=None):
        super().__init__(cfg, data_name, train)
        from .transforms_audio import FbankViews
        from .transforms_image import AuthenticImageViews

        # running.clip_tf selects the un-augmented CLIP two-view path, like
        # the reference (`/root/reference/cvap/data/image_audio.py:232-237`;
        # its clip_tf branch resolves to AuthenticCLIPImageTransform)
        res = int(self.cfg.get("resolution", 224))
        self.two_view_image = (
            AuthenticImageViews(res)
            if bool(self.cfg.get("clip_tf", False))
            else SharedImageTransform(res)
        )
        self.fbank_views = FbankViews()
        flags = loss_flags or {}
        self.use_vv = bool(flags.get("vv", True))
        self.use_aa = bool(flags.get("aa", False))
        if self.on_device and self.norms is None:
            # the host path's FbankViews hardcodes the reference's AudioSet
            # norms; the device frontend normalizes only from cfg — unset
            # norms would silently train the trunk on raw log-mels. The
            # per-view mask asymmetry (32/200 vs 48/300) also collapses to
            # the cfg-defined sizes under on_device.
            import warnings

            from .transforms_audio import AUDIOSET_FBANK_MEAN, AUDIOSET_FBANK_STD

            warnings.warn(
                "siamese on_device=True with running.audio.norms unset: the "
                "host two-view path normalizes with the hardcoded AudioSet "
                f"stats — set norms=[{AUDIOSET_FBANK_MEAN},{AUDIOSET_FBANK_STD}] "
                "for parity",
                UserWarning,
            )

    def _audio_views(self, fname: str):
        if self.on_device:
            # waveform-shipping mode: masks/normalization run on device
            # (ops.specaugment); two independent crops stand in for the
            # host two-view path. The inactive second view ships the
            # featurized VIEW_SENTINEL (rank-3, passes the device frontend
            # untouched) — a truncated waveform slice would be treated as
            # a raw waveform and crash the jitted fbank at eval
            from .transforms_audio import VIEW_SENTINEL

            a1 = self._audio_waveform(fname)
            a2 = (
                self._audio_waveform(fname)
                if (self.train and self.use_aa)
                else VIEW_SENTINEL
            )
            return a1, a2
        fb = extract_fbank_features(
            fname,
            self.params,
            max_audio_len=int(self.cfg.max_audio_len),
            train=self.train,
            zero_mean_wf=bool(self.acfg.get("zero_mean_wf", True)),
            tile_audio=bool(self.acfg.get("tile_audio", False)),
            transform_audio=self.transform_audio if self.train else None,
            norms=None,  # FbankViews owns the (reference-hardcoded) norms
            transform_fbank=None,  # masks are per-view, below
        )
        return self.fbank_views(fb, both=self.use_aa, train=self.train)

    def __getitem__(self, index: int) -> Dict[str, Any]:
        name, aclip_file, frame_file, frame_emb_file = self._paths(index)
        # decode the frame jpeg ONCE for pivot + two views (jpeg decode is
        # the GIL-bound host item cost; a corrupt frame also falls back to
        # the SAME random image for pivot and views)
        img = self._open_image(frame_file)
        pivot = (
            self._image_emb(frame_emb_file)
            if frame_emb_file is not None
            else self._image(frame_file, img=img)
        )
        v1, v2 = self.two_view_image(img, both=self.use_vv, train=self.train)
        a1, a2 = self._audio_views(aclip_file)
        return {
            "image": pivot,
            "image_v1": v1,
            "image_v2": v2,
            "audio_v1": a1,
            "audio_v2": a2,
            "name": name,
        }


class ImageAudioCollator:
    """Stack to [B, ...] with the channel axis the towers expect
    (parity: `/root/reference/cvap/data/image_audio.py:307-331`)."""

    def __init__(self, siamese: bool = False):
        self.siamese = siamese

    def __call__(self, items: List[Dict]) -> Dict[str, np.ndarray]:
        out: Dict[str, Any] = {"name": [it["name"] for it in items]}
        keys = (
            ("image", "image_v1", "image_v2", "audio_v1", "audio_v2")
            if self.siamese
            else ("image", "audio")
        )
        for key in keys:
            arr = np.stack([it[key] for it in items])
            # uint8 images, int16 waveforms and bf16 fbanks convert on
            # device (4x / 2x smaller host->device transfers); copy=False —
            # a second full-batch copy costs ~200 ms on the 1-CPU bench host
            if arr.dtype not in _SHIP_DTYPES:
                arr = arr.astype(np.float32, copy=False)
            if key.startswith("audio") and arr.ndim == 3:
                arr = arr[:, None]  # [B, 1, T, M]
            out[key] = arr
        return out


def build_image_audio_dataloader(
    cfg, data_name: str, train: bool, process_id: int = 0, num_processes: int = 1,
    device_put_fn=None,
):
    """Name-prefix dispatch src/npz + host-sharded loader
    (parity: `/root/reference/cvap/data/image_audio.py:333-375`)."""
    run = cfg.running
    siamese = bool(run.get("multi_view", False))
    if siamese:
        # view production follows the active loss flags (the reference
        # dataset reads cfg.model.loss directly,
        # `/root/reference/cvap/data/image_audio.py:230`)
        loss_cfg = cfg.get("model", None)
        loss_cfg = loss_cfg.get("loss", None) if loss_cfg is not None else None
        flags = (
            {k: loss_cfg.get(k, None) for k in ("vv", "aa") if loss_cfg.get(k, None) is not None}
            if loss_cfg is not None
            else {}
        )
        ds = ImageAudioDatasetSiameseSrc(run, data_name, train, loss_flags=flags)
    elif data_name.startswith("pak"):
        from .packed import ImageAudioDatasetPak

        ds = ImageAudioDatasetPak(run, data_name, train)
    elif data_name.startswith("npz"):
        ds = ImageAudioDatasetNpz(run, data_name, train)
    else:
        ds = ImageAudioDatasetSrc(run, data_name, train)
    ds.records = shard_for_host(ds.records, process_id, num_processes)
    return DataLoader(
        ds,
        batch_size=int(run.batch_size) // max(num_processes, 1),
        collate_fn=ImageAudioCollator(siamese=siamese),
        shuffle=train,
        drop_last=train,
        num_workers=int(cfg.get("num_proc", 4)),
        backend=str(cfg.get("loader_backend", "thread")),
        seed=int(cfg.get("seed", 0)),
        device_put_fn=device_put_fn,
        pad_last=not train,  # fixed eval shapes → one compile
    )
