"""Task monitors (drivers) beyond VA pre-training.

Parity with the reference monitor suite (SURVEY.md §2.2):
``LAMonitor`` (audio-text fine-tune/retrieval/captioning,
`/root/reference/cvap/monitor/clap.py`), ``VALMonitor`` (trimodal,
`cvalp.py`), ``VASMonitor`` (siamese multi-view, `siamese_va.py`),
``ASMonitor`` (AudioSet clf + zero-shot, `audioset_clf.py`), and
``ESCMonitor`` (x-fold classification + zero-shot, `esc50_clf.py`).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import jax
import numpy as np

from ..ckpt import extract_model_files
from ..eval import (
    classification_p1,
    multilabel_report,
    one_vs_k_retrieval,
    symmetric_retrieval,
    zero_shot_classification,
)
from ..eval.metrics import _normalize as _l2
from ..parallel import data_shard_info, shard_batch
from .trainer import Trainer, register_monitor


@register_monitor("LAMonitor")
class LATrainer(Trainer):
    """Audio-text fine-tuning / retrieval / captioning."""

    batch_keys = ("audio", "text")
    grad_cache_methods = ("encode_audio", "encode_text")

    def build_data(self):
        from ..data import build_audio_text_dataloader, build_image_text_dataloader

        cfg, run = self.cfg, self.cfg.running
        pid, np_ = data_shard_info(self.mesh)  # data-shard-group coords (mesh.py)
        which = str(run.get("dataloader", "al"))
        build = (
            build_image_text_dataloader if which == "lv" else build_audio_text_dataloader
        )
        if which == "lv":  # image↔text (CLVP) variant
            self.batch_keys = ("image", "text")
            self.grad_cache_methods = ("encode_image", "encode_text")
        self.loader = (
            build(cfg, str(run.data_name), True, pid, np_)
            if not self.eval_mode and run.get("data_name")
            else None
        )
        self.evalloader = build(cfg, str(run.eval_name), False) if run.get("eval_name") else None
        self.testloader = (
            self._optional_test_loader(
                lambda: build(cfg, str(run.test_name), False), str(run.test_name)
            )
            if run.get("test_name")
            else None
        )
        self.output_dim = None

    def loss_adapter(self, model, variables, batch, rngs):
        """Branch on cfg.running.retrieval when a captioning decoder exists
        (parity: `/root/reference/cvap/monitor/clap.py:206`)."""
        if self.needs_device_frontend:
            batch = self.device_frontend(batch, rngs, train=True)
        mutable = ["batch_stats"] if self.has_batch_stats else False
        if not hasattr(model, "decoder"):  # e.g. CLVP image↔text
            return model.apply(variables, *batch, train=True, rngs=rngs, mutable=mutable)
        # default mirrors CLAP's own auto-detect: retrieval requires a text
        # tower (a caption-only model must not default into
        # forward_retrieval and call its None text tower)
        retrieval = model.decoder is None or bool(
            self.cfg.running.get("retrieval", model.text is not None)
        )
        return model.apply(
            variables, *batch, retrieval=retrieval, train=True, rngs=rngs, mutable=mutable
        )

    def infer(self, loader, samples=None, gold_file=None) -> str:
        """1-vs-5 retrieval report
        (parity: `/root/reference/cvap/module/decoder/loss_head.py:135-169`);
        captioning configs report decoded samples instead."""
        self._warn_gold_unused(gold_file)
        if getattr(self.model, "text", None) is None:
            return self.caption_report(loader, samples=samples)
        data = self.collect_features(loader, samples=samples)
        a, t = data["x1"], data["x2"]
        k = t.shape[0] // a.shape[0]
        m = one_vs_k_retrieval(a, t, k=k)
        ref = m["ref_a2t"]
        return (
            f"A->T: t1 = {m['a2t']['t1']:2.2f} t5 = {m['a2t']['t5']:2.2f} mR = {m['a2t']['mR']:2.2f} "
            f"T->A: t1 = {m['t2a']['t1']:2.2f} t5 = {m['t2a']['t5']:2.2f} mR = {m['t2a']['mR']:2.2f} "
            f"@ {a.shape[0]} | REF A->T R@1 {ref['R@1']:2.2f} R@5 {ref['R@5']:2.2f} "
            f"R@10 {ref['R@10']:2.2f} R@50 {ref['R@50']:2.2f} MED {ref['MED']:2.2f} AVG {ref['AVG']:2.2f}"
        )

    def mid_train_eval_ok(self, loss: float) -> bool:
        """Skip the periodic retrieval eval while the CE is still too large
        (parity: `/root/reference/cvap/monitor/clap.py:245,256` — "no need
        to eval if CE is too large", bound 5). ``running.eval_loss_bound``
        overrides; inf disables the guard."""
        bound = float(self.cfg.running.get("eval_loss_bound", 5.0))
        return not np.isfinite(bound) or float(loss) < bound

    def learn(self):
        """Adds the reference's end-of-training test-set pass and
        log-manifest repeated eval (`/root/reference/cvap/monitor/clap.py:116-133`)."""
        model_file = str(self.cfg.get("model_file", "") or "")
        if model_file.endswith(".out"):
            return self.repeated_retrieval()
        out = super().learn()
        if self.testloader is not None:
            self.echo.info(
                "TEST "
                + self.infer(self.testloader, samples=self._samples_cap("test_samples"))
            )
        return out

    def repeated_retrieval(self) -> List[str]:
        """Evaluate every checkpoint named in a training log
        (parity: `/root/reference/cvap/monitor/clap.py:116-133,302-311`)."""
        log_path = os.path.join(
            str(self.cfg.model_root), str(self.cfg.model_name), str(self.cfg.model_file)
        )
        reports = []
        cap = self._eval_all_cap()
        for ckpt in extract_model_files(log_path):
            from ..ckpt import load_checkpoint

            self.state = load_checkpoint(ckpt, self.state)
            reports.append(f"{ckpt}: {self.infer(self.evalloader, samples=cap)}")
            self.echo.info(reports[-1])
        return reports

    def encode_text_dump(self, texts: np.ndarray, out_path: str):
        """Caption-embedding dump to npz
        (parity: `/root/reference/cvap/monitor/clap.py:46-76`)."""
        variables = self.eval_variables()
        enc = self.memo(
            "la_text_step",
            lambda: jax.jit(lambda v, t: self.model.apply(v, t, method="encode_text")),
        )
        embs = []
        for i in range(0, len(texts), 256):
            chunk = np.asarray(texts[i : i + 256])
            n = chunk.shape[0]
            if n < 256:  # pad to the jitted shape, trim after
                chunk = np.concatenate([chunk, np.tile(chunk[-1:], (256 - n, 1))])
            embs.append(np.asarray(enc(variables, jax.numpy.asarray(chunk)))[:n])
        np.savez(out_path, v=np.concatenate(embs))
        return out_path

    def encode_text(self, loader=None, out_root: Optional[str] = None) -> str:
        """Per-audio-name caption-embedding dump — the asset generator for
        the trimodal external-text recipe (parity:
        `/root/reference/cvap/monitor/clap.py:46-76`): writes
        ``{data_root}/caption/audiocap/{clip_model_name}/{name}.npz`` with
        ``v = [ncap, D]`` text embeddings, consumable as precomputed
        text embeddings downstream."""
        run = self.cfg.running
        loader = loader if loader is not None else (self.evalloader or self.loader)
        if out_root is None:
            model_file = str(run.get("clip_model_name", "model")).lower()
            out_root = os.path.join(str(run.data_root), "caption", "audiocap", model_file)
        os.makedirs(out_root, exist_ok=True)
        variables = self.eval_variables()
        enc = self.memo(
            "la_text_step_b",
            lambda: jax.jit(lambda v, t: self.model.apply(v, t, method="encode_text")),
        )
        nsample = 0
        for batch in loader:
            names = list(batch["name"])
            text = np.asarray(batch["text"])
            n = int(batch.get("_count", len(names)))
            emb = np.asarray(enc(variables, jax.numpy.asarray(text)))
            assert emb.shape[0] % len(names) == 0, "captions must tile names evenly"
            k = emb.shape[0] // len(names)
            for i, name in enumerate(names[:n]):
                np.savez_compressed(
                    os.path.join(out_root, str(name)), v=emb[i * k : (i + 1) * k]
                )
            nsample += n * k
        self.echo.info(f"Saving {nsample} text vectors to `{out_root}`.")
        return out_root

    @staticmethod
    def _detok_row(row) -> str:
        from ..tokenizer import detokenize_ids

        return detokenize_ids(row)

    def _decode_step(self):
        beam = int(self.cfg.running.get("beam", 0) or 0)
        return self.memo(
            "la_decode_step",
            lambda: jax.jit(
                lambda v, a: self.model.apply(v, a, beam=beam, method="decode")
            ),
        )

    def decode_captions(self, loader, max_batches: int = 10) -> List[str]:
        """Greedy caption decoding through the SeqGenerationHead (KV-cached).
        Audio routes through the eval device frontend like every other eval
        path — raw shipped waveforms/int16 fbanks fed straight to decode()
        would hit the precomputed-embedding passthrough."""
        variables = self.eval_variables()
        dec = self._decode_step()
        aidx = self.batch_keys.index("audio")
        out = []
        for bi, batch in enumerate(loader):
            if bi >= max_batches:
                break
            ids, _ = dec(variables, self.eval_frontend_args(batch)[aidx])
            n = int(batch.get("_count", len(batch["name"])))
            for row in np.asarray(ids)[:n]:
                out.append(self._detok_row(row[1:]))
        return out

    def caption_report(self, loader, samples=None) -> str:
        """Decode the whole eval set and score corpus BLEU-1..4, ROUGE-L and
        CIDEr-D against the k gold captions per clip
        (parity: `/root/reference/cvap/module/decoder/loss_more.py:328-371`,
        the dependency-free core of the COCO-caption suite)."""
        from ..eval.metrics import cider_d, corpus_bleu, meteor, rouge_l

        variables = self.eval_variables()
        dec = self._decode_step()
        aidx = self.batch_keys.index("audio")
        cands, refs = [], []
        for batch in loader:
            if samples is not None and len(cands) >= samples:
                break
            B = batch["audio"].shape[0]
            n = int(batch.get("_count", B))
            k = batch["text"].shape[0] // B
            ids, _ = dec(variables, self.eval_frontend_args(batch)[aidx])
            text = np.asarray(batch["text"])
            for i, row in enumerate(np.asarray(ids)[:n]):
                cands.append(self._detok_row(row[1:]))
                refs.append(
                    [self._detok_row(text[i * k + j]) for j in range(k)]
                )
        scores = corpus_bleu(cands, refs)
        scores["ROUGE-L"] = rouge_l(cands, refs)
        scores["METEOR"] = meteor(cands, refs)
        scores["CIDEr-D"] = cider_d(cands, refs)
        sample = "; ".join(cands[:3])
        line = " ".join(f"{k_} = {v:2.2f}" for k_, v in scores.items())
        return f"{line} @ {len(cands)} | e.g.: {sample}"


@register_monitor("VALMonitor")
class VALTrainer(Trainer):
    """Trimodal V-A-L training on AudioSet
    (parity: `/root/reference/cvap/monitor/cvalp.py`)."""

    batch_keys = ("image", "audio", "text")

    def build_data(self):
        from ..data import build_audioset_dataloader, build_audioset_label_map

        cfg, run = self.cfg, self.cfg.running
        pid, np_ = data_shard_info(self.mesh)  # data-shard-group coords (mesh.py)
        self.label_map = build_audioset_label_map(run) if run.get("label_map") else None
        kw = dict(label_map=self.label_map)
        self.loader = (
            build_audioset_dataloader(cfg, str(run.data_name), True, process_id=pid, num_processes=np_, **kw)
            if not self.eval_mode and run.get("data_name")
            else None
        )
        self.evalloader = (
            build_audioset_dataloader(cfg, str(run.eval_name), False, **kw)
            if run.get("eval_name")
            else None
        )
        # separate test split evaluated at every save
        # (parity: `/root/reference/cvap/monitor/cvalp.py:97-104,254-264`)
        self.testloader = (
            self._optional_test_loader(
                lambda: build_audioset_dataloader(cfg, str(run.test_name), False, **kw),
                str(run.test_name),
            )
            if not self.eval_mode and run.get("test_name")
            else None
        )
        self.output_dim = None

    def infer(self, loader, samples=None, gold_file=None) -> str:
        self._warn_gold_unused(gold_file)
        data = self.collect_features(loader, samples=samples)
        parts = []
        if "x1" in data and "x2" in data:
            sym = symmetric_retrieval(data["x1"], data["x2"])
            parts.append(f"VA: I->A t1 {sym['12']['t1']:2.2f} A->I t1 {sym['21']['t1']:2.2f}")
        if "x2" in data and "x3" in data:
            sym = symmetric_retrieval(data["x2"], data["x3"])
            parts.append(f"AL: A->L t1 {sym['12']['t1']:2.2f} L->A t1 {sym['21']['t1']:2.2f}")
        if self.label_map is not None and bool(self.cfg.running.get("zero_shot", False)):
            # same sample budget as the retrieval pass — an unbudgeted
            # zero-shot would scan the full split at every save. The audio
            # embeddings are reused from collect_features (x2): re-encoding
            # the same clips would double eval wall-clock per checkpoint
            parts.append(
                self.zero_shot(loader, samples=samples, audio_embs=data.get("x2"))
            )
        return " | ".join(parts) + f" @ {data['x1'].shape[0]}"

    def zero_shot(self, loader, samples=None, audio_embs=None) -> str:
        """Audio -> label-prompt P@1 over the label-map space
        (parity: `/root/reference/cvap/monitor/cvalp.py:273-300` through the
        VALCE report's ``label_map`` kwarg,
        `/root/reference/cvap/module/decoder/loss_head.py:371-400`)."""
        from ..data.audioset import label_map_token_matrix

        ids = label_map_token_matrix(self.label_map)
        variables = self.eval_variables()
        enc_t = self.memo(
            "val_text_step",
            lambda: jax.jit(lambda v, t: self.model.apply(v, t, method="encode_text")),
        )
        enc_a = self.memo(
            "val_audio_step",
            lambda: jax.jit(lambda v, a: self.model.apply(v, a, method="encode_audio")),
        )
        text = np.asarray(enc_t(variables, jax.numpy.asarray(ids)))
        embs, labels = [], []
        n_got = 0
        aidx = self.batch_keys.index("audio")
        for batch in loader:
            if audio_embs is not None:
                # embeddings precomputed (collect_features x2, identical
                # encode_audio outputs in the same deterministic loader
                # order) — walk the loader only to gather aligned labels
                if n_got >= audio_embs.shape[0]:
                    break
                n = int(batch.get("_count", batch["audio"].shape[0]))
                n_got += n
                labels.append(np.asarray(batch["label"])[:n])
                continue
            if samples is not None and n_got >= samples:
                break
            n = int(batch.get("_count", batch["audio"].shape[0]))
            n_got += n
            audio = self.eval_frontend_args(batch)[aidx]
            a = enc_a(variables, jax.numpy.asarray(audio))
            embs.append(np.asarray(a)[:n])
            labels.append(np.asarray(batch["label"])[:n])
        if audio_embs is not None:
            labels = np.concatenate(labels)
            m = min(audio_embs.shape[0], labels.shape[0])
            audio, labels = np.asarray(audio_embs)[:m], labels[:m]
        else:
            audio, labels = np.concatenate(embs), np.concatenate(labels)
        keep = labels >= 0
        p1 = zero_shot_classification(audio[keep], text, labels[keep])
        return f"A->T: p1 = {p1:2.2f}"

    def collect_model_export(self):
        params = self.state.full_params()
        return {k: params[k] for k in ("image", "audio", "text", "loss") if k in params}


@register_monitor("VASMonitor")
class VASTrainer(Trainer):
    """Multi-view siamese VA training
    (parity: `/root/reference/cvap/monitor/siamese_va.py`): view tuple
    composition follows the active loss flags (`:23-62`)."""

    def __init__(self, cfg, echo=None):
        loss_cfg = cfg.model.loss
        self.use_vv = bool(loss_cfg.get("vv", True))
        self.use_aa = bool(loss_cfg.get("aa", False))
        super().__init__(cfg, echo)

    batch_keys = ("image", "image_v1", "audio_v1", "image_v2", "audio_v2")

    def build_data(self):
        from ..data import build_image_audio_dataloader

        cfg, run = self.cfg, self.cfg.running
        pid, np_ = data_shard_info(self.mesh)  # data-shard-group coords (mesh.py)
        self.loader = (
            build_image_audio_dataloader(cfg, str(run.data_name), True, pid, np_)
            if not self.eval_mode and run.get("data_name")
            else None
        )
        self.evalloader = (
            build_image_audio_dataloader(cfg, str(run.eval_name), False)
            if run.get("eval_name")
            else None
        )
        self.output_dim = None

    def make_batch(self, batch):
        args = [batch["image"], batch["image_v1"], batch["audio_v1"]]
        args.append(batch["image_v2"] if self.use_vv else None)
        args.append(batch["audio_v2"] if self.use_aa else None)
        present = [a for a in args if a is not None]
        sharded = list(shard_batch(tuple(present), self.mesh))
        return tuple(sharded.pop(0) if a is not None else None for a in args)

    def infer(self, loader, samples=None, gold_file=None) -> str:
        """Pivot-image ↔ audio retrieval on eval batches
        (parity: `/root/reference/cvap/monitor/siamese_va.py:154-180`)."""
        self._warn_gold_unused(gold_file)
        data = self._collect_pivot_features(loader, samples=samples)
        sym = symmetric_retrieval(data["v"], data["a"])
        return (
            f"I->A: t1 = {sym['12']['t1']:2.2f} A->I: t1 = {sym['21']['t1']:2.2f} "
            f"@ {data['v'].shape[0]}"
        )

    def _collect_pivot_features(self, loader, samples=None):
        variables = self.eval_variables()

        def _enc(variables, image, audio):
            v = self.model.apply(variables, image, method="encode_pivot_image")
            a = self.model.apply(variables, audio, method="encode_audio_view")
            return v, a

        enc = self.memo("pivot_step", lambda: jax.jit(_enc))

        vs, aas = [], []
        n_got = 0
        iidx = self.batch_keys.index("image")
        aidx = self.batch_keys.index("audio_v1")
        for batch in loader:
            if samples is not None and n_got >= samples:
                break
            # through the device frontend (uint8 normalize / waveform
            # fbank), same invariant as every other eval path
            # (trainer.eval_frontend_args)
            args = self.eval_frontend_args(batch)
            v, a = enc(variables, args[iidx], args[aidx])
            n = int(batch.get("_count", len(batch["name"])))
            vs.append(np.asarray(v)[:n])
            aas.append(np.asarray(a)[:n])
            n_got += n
        return {"v": np.concatenate(vs), "a": np.concatenate(aas)}

    def collect_model_export(self):
        params = self.state.full_params()
        return {k: params[k] for k in ("audio", "loss") if k in params}


@register_monitor("ASMonitor")
class ASTrainer(Trainer):
    """AudioSet multi-label classification + zero-shot
    (parity: `/root/reference/cvap/monitor/audioset_clf.py`)."""

    batch_keys = ("image", "audio", "label")

    def build_data(self):
        from ..data import build_audioset_dataloader, build_audioset_label_map

        cfg, run = self.cfg, self.cfg.running
        pid, np_ = data_shard_info(self.mesh)  # data-shard-group coords (mesh.py)
        self.label_map = build_audioset_label_map(run)
        self.output_dim = len(self.label_map)
        kw = dict(label_map=self.label_map)
        self.loader = (
            build_audioset_dataloader(cfg, str(run.data_name), True, process_id=pid, num_processes=np_, **kw)
            if not self.eval_mode and run.get("data_name")
            else None
        )
        self.evalloader = (
            build_audioset_dataloader(cfg, str(run.eval_name), False, **kw)
            if run.get("eval_name")
            else None
        )
        # separate test split evaluated at every save
        # (parity: `/root/reference/cvap/monitor/audioset_clf.py:137-144,314-321`)
        self.testloader = (
            self._optional_test_loader(
                lambda: build_audioset_dataloader(cfg, str(run.test_name), False, **kw),
                str(run.test_name),
            )
            if not self.eval_mode and run.get("test_name")
            else None
        )

    def infer(self, loader, samples=None, gold_file=None) -> str:
        """Multi-label report over sigmoid scores
        (parity: `/root/reference/cvap/module/decoder/loss_more.py:92-131`)."""
        self._warn_gold_unused(gold_file)
        variables = self.eval_variables()

        score = self.memo(
            "score_step",
            lambda: jax.jit(
                lambda variables, image, audio, label: self.model.apply(
                    variables, image, audio, label, train=False
                )
            ),
        )

        scores, labels = [], []
        n_got = 0
        for batch in loader:
            if samples is not None and n_got >= samples:
                break
            n = int(batch.get("_count", batch["label"].shape[0]))
            n_got += n
            image, audio, label = self.eval_frontend_args(batch)
            s = score(
                variables,
                jax.numpy.asarray(image),
                jax.numpy.asarray(audio),
                jax.numpy.asarray(label),
            )
            if isinstance(s, tuple):
                s = s[0]
            scores.append(np.asarray(s)[:n])
            labels.append(batch["label"][:n])
        m = multilabel_report(np.concatenate(scores), np.concatenate(labels))
        return (
            f"Mac-AP = {m['Mac-AP']:2.2f} Mic-AP = {m['Mic-AP']:2.2f} wAP = {m['wAP']:2.2f} "
            f"mAP = {m['mAP']:2.2f} mAUC = {m['mAUC']:2.2f} mP = {m['mP']:2.2f} mR = {m['mR']:2.2f}"
        )

    def encode_label_texts(self) -> np.ndarray:
        """Label-prompt embeddings, batched
        (parity: `/root/reference/cvap/monitor/audioset_clf.py:362-375`)."""
        from ..data.audioset import label_map_token_matrix

        ids = label_map_token_matrix(self.label_map)
        variables = self.eval_variables()
        enc = self.memo(
            "as_text_step",
            lambda: jax.jit(lambda v, t: self.model.apply(v, t, method="encode_text")),
        )
        embs = []
        for i in range(0, len(ids), 128):
            chunk = ids[i : i + 128]
            n = chunk.shape[0]
            if n < 128:  # pad to the jitted shape, trim after
                chunk = np.concatenate([chunk, np.tile(chunk[-1:], (128 - n, 1))])
            embs.append(np.asarray(enc(variables, jax.numpy.asarray(chunk)))[:n])
        return np.concatenate(embs)

    def _audio_step(self):
        return self.memo(
            "as_audio_step",
            lambda: jax.jit(lambda v, a: self.model.apply(v, a, method="encode_audio")),
        )

    def zero_shot(self, loader, samples=None) -> str:
        """audio↔label-text similarity → multi-label metrics
        (parity: `/root/reference/cvap/monitor/audioset_clf.py:377-404`)."""
        text = _l2(self.encode_label_texts())
        variables = self.eval_variables()
        enc = self._audio_step()
        scores, labels = [], []
        n_got = 0
        for batch in loader:
            if samples is not None and n_got >= samples:
                break
            n = int(batch.get("_count", batch["label"].shape[0]))
            n_got += n
            audio = self.eval_frontend_args(batch)[1]
            a = enc(variables, jax.numpy.asarray(audio))
            scores.append(_l2(np.asarray(a)[:n]) @ text.T)
            labels.append(batch["label"][:n])
        m = multilabel_report(np.concatenate(scores), np.concatenate(labels))
        return f"zero-shot mAP = {m['mAP']:2.2f} mAUC = {m['mAUC']:2.2f}"

    def repeated_zero_shot(self) -> List[str]:
        """Zero-shot every checkpoint in the log manifest
        (parity: `/root/reference/cvap/monitor/audioset_clf.py:406-418`)."""
        from ..ckpt import load_checkpoint

        log_path = os.path.join(
            str(self.cfg.model_root), str(self.cfg.model_name), str(self.cfg.model_file)
        )
        reports = []
        cap = self._eval_all_cap()
        for ckpt in extract_model_files(log_path):
            self.state = load_checkpoint(ckpt, self.state)
            reports.append(f"{ckpt}: {self.zero_shot(self.evalloader, samples=cap)}")
            self.echo.info(reports[-1])
        return reports

    def encode_audios_dump(self, loader, out_path: str) -> str:
        """Audio-embedding dump
        (parity: `/root/reference/cvap/monitor/audioset_clf.py:70-98`)."""
        variables = self.eval_variables()
        enc = self._audio_step()
        embs, names = [], []
        for batch in loader:
            n = int(batch.get("_count", batch["audio"].shape[0]))
            audio = self.eval_frontend_args(batch)[1]
            a = enc(variables, jax.numpy.asarray(audio))
            embs.append(np.asarray(a)[:n])
            names.extend(batch["name"][:n])
        np.savez(out_path, v=np.concatenate(embs), names=np.asarray(names))
        return out_path

    def collect_model_export(self):
        params = self.state.full_params()
        return {k: params[k] for k in ("audio", "loss") if k in params}


@register_monitor("ESCMonitor")
class ESCTrainer(Trainer):
    """ESC-50 / US8K / AudioSet-eval / VoxCeleb2 x-fold classification and
    zero-shot (parity: `/root/reference/cvap/monitor/esc50_clf.py`)."""

    batch_keys = ("audio", "label")

    def build_data(self):
        from ..data import build_xfold_dataloader_list

        self.folds, self.classes, self.label_ids, extras = build_xfold_dataloader_list(
            self.cfg
        )
        # multi-prompt zero-shot collapse map (prompt row -> class id) and
        # the VoxCeleb2 speaker-id -> face-file map. The face map is carried
        # for index-format parity only — the reference builds lid2face and
        # never consumes it either (`/root/reference/cvap/data/esc50.py:397-442`,
        # its only use is a commented-out print)
        self.zs_label_map = extras.get("label_map")
        self.faces = extras.get("faces")
        self.output_dim = len(self.classes)
        first_train, first_eval = self.folds[0]
        self.loader = first_train
        self.evalloader = first_eval

    def encode_label_texts(self) -> np.ndarray:
        variables = self.eval_variables()
        enc = self.memo(
            "esc_text_step",
            lambda: jax.jit(
                lambda v, ids: self.model.apply(v, ids, method="encode_text")
            ),
        )
        return np.asarray(enc(variables, jax.numpy.asarray(self.label_ids)))

    def _fold_apply(self, loader, method: str) -> Tuple[np.ndarray, np.ndarray]:
        """Per-batch jitted ``method`` over an eval loader (padded final
        batch trimmed by its true count)."""
        variables = self.eval_variables()
        step = self.memo(
            f"esc_{method}_step",
            lambda: jax.jit(
                lambda v, a: self.model.apply(v, a, method=method)
            ),
        )
        outs, labels = [], []
        for batch in loader:
            n = int(batch.get("_count", batch["audio"].shape[0]))
            audio = self.eval_frontend_args(batch)[0]
            o = np.asarray(step(variables, jax.numpy.asarray(audio)))
            outs.append(o[:n])
            labels.append(batch["label"][:n])
        return np.concatenate(outs), np.concatenate(labels)

    def _fold_predictions(self, loader) -> Tuple[np.ndarray, np.ndarray]:
        return self._fold_apply(loader, "predictions")

    def infer(self, loader, samples=None, gold_file=None) -> str:
        """Supervised P@1 on a fold's eval loader — the base class's
        feature-pair retrieval infer does not apply to a single-tower
        classifier (ESClassifier has no ``features`` method). Folds are
        small; the sample budget is ignored."""
        self._warn_gold_unused(gold_file)
        preds, labels = self._fold_predictions(loader)
        p1 = 100.0 * float(np.mean(preds == labels)) if len(labels) else 0.0
        return f"P@1 = {p1:2.2f} @ {len(labels)}"

    def _fold_audio_features(self, loader) -> Tuple[np.ndarray, np.ndarray]:
        return self._fold_apply(loader, "encode_audio")

    def zero_shot(self, loader) -> float:
        """Per-fold zero-shot P@1
        (parity: `/root/reference/cvap/monitor/esc50_clf.py:260-292`)."""
        text = self.encode_label_texts()
        audio, labels = self._fold_audio_features(loader)
        return zero_shot_classification(audio, text, labels, label_map=self.zs_label_map)

    def repeated_zero_shot(self) -> List[str]:
        """Zero-shot every checkpoint in the log manifest
        (parity: `/root/reference/cvap/monitor/esc50_clf.py:327-337`)."""
        from ..ckpt import load_checkpoint

        log_path = os.path.join(
            str(self.cfg.model_root), str(self.cfg.model_name), str(self.cfg.model_file)
        )
        reports = []
        for ckpt in extract_model_files(log_path):
            self.state = load_checkpoint(ckpt, self.state)
            p1 = self.standard_zero_shot()
            reports.append(f"{ckpt}: p1 = {p1:2.2f}")
        return reports

    def standard_zero_shot(self) -> float:
        """Pooled zero-shot over all folds
        (parity: `/root/reference/cvap/monitor/esc50_clf.py:294-325`)."""
        text = self.encode_label_texts()
        audios, labels = [], []
        for _, eval_loader in self.folds:
            a, l = self._fold_audio_features(eval_loader)
            audios.append(a)
            labels.append(l)
        p1 = zero_shot_classification(
            np.concatenate(audios), text, np.concatenate(labels),
            label_map=self.zs_label_map,
        )
        self.echo.info(f"A->T: p1 = {p1:2.2f} @ {sum(len(l) for l in labels)}")
        return p1

    def learn(self):
        if bool(self.cfg.running.get("zero_shot", False)) or self.eval_mode:
            return self.standard_zero_shot()
        # supervised x-fold loop with re-initialization per fold and a
        # per-EPOCH eval trace — the reference's model-selection protocol
        # scores every epoch and summarizes over the best common epoch
        # (parity: `/root/reference/cvap/monitor/esc50_clf.py:43-120`)
        report_by_fold = []
        for fi, (train_loader, eval_loader) in enumerate(self.folds):
            if train_loader is None:  # eval-only sets (AudioSet, VoxCeleb2)
                return self.standard_zero_shot()
            # loaders first: reinitialize() derives the LR schedule from
            # len(self.loader) (per-fold steps_per_epoch)
            self.loader, self.evalloader = train_loader, eval_loader
            self.reinitialize()
            report_by_epoch = []
            for ie in range(int(self.cfg.running.epochs)):
                self.loader.set_epoch(ie)
                self.epoch(ie)
                preds, labels = self._fold_predictions(eval_loader)
                acc = classification_p1(preds, labels)
                report_by_epoch.append(acc)
            report_by_fold.append(report_by_epoch)
            self.echo.info(
                f"fold {fi}: p1 = {report_by_epoch[-1]:2.2f} "
                f"(best {max(report_by_epoch):2.2f})"
            )
            # release this fold's worker pools (process backend) — the
            # loaders stay referenced in self.folds for the whole run
            train_loader.shutdown()
            if eval_loader is not None:
                eval_loader.shutdown()
        return self.summary_report(np.asarray(report_by_fold))

    def summary_report(self, report: np.ndarray) -> float:
        """Cross-fold summary at (a) the best COMMON epoch (the reference's
        headline) and (b) each fold's own best epoch
        (parity: `/root/reference/cvap/monitor/esc50_clf.py:104-120`)."""
        nfold, nepoch = report.shape[:2]
        self.echo.info(f"Total {nepoch} epochs for each of {nfold} folds.")
        best_epoch = int(report.sum(0).argmax())
        best = report[:, best_epoch]
        mean, std = float(best.mean()), float(best.std())
        self.echo.info(
            f"Best mean and std: {mean:2.2f} \\pm {std:2.2f} "
            f"in the {best_epoch}th epoch."
        )
        max_p, max_e = report.max(axis=1), report.argmax(axis=1)
        self.echo.info(
            f"Max mean and std: {max_p.mean():2.2f} \\pm {max_p.std():2.2f} "
            f"in the {max_e.tolist()}th epoch."
        )
        return mean

    def reinitialize(self):
        self.build_model()
        self.build_optimizer()
        # each fold is a fresh run: fold-local step keeps the logged LR
        # (lr_schedule(global_step)) and peep/save cadence aligned with the
        # optimizer's actual schedule position (state.step restarts at 0)
        self.global_step = 0

    def make_batch(self, batch):
        return shard_batch((batch["audio"], batch["label"]), self.mesh)

    def collect_model_export(self):
        params = self.state.full_params()
        return {k: params[k] for k in ("audio", "loss") if k in params}
