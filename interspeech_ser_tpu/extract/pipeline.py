"""Batched, bucketed, device-resident embedding extraction (the north star).

Replaces the reference's batch-1 ThreadPoolExecutor extraction
(reference: preprocessing/preprocess_speech.py:45-73, 119-122; SURVEY.md
§3.1) with the TPU-native design:

  header-only batch plan (exact post-resample lengths, length-sorted
  token-budget batches)  ──►  decoder threads + assembler feeding a
  bounded queue (host RSS independent of corpus size)  ──►  device loop
  dispatching batch k before fetching batch k-1 (double-buffered D2H;
  layer-select/mean-last-4 REDUCED ON DEVICE so only [B,T,D] of the
  selected output crosses HBM→host)  ──►  backpressured per-utterance
  ``.pt`` writer threads. Machinery in ``extract/streaming.py``.

Layer-selection semantics: ``n_layer`` (HF hidden_states indexing, -1 =
last) or mean-of-last-4 (``use_average``), matching preprocess_speech.py:52-67.
The reference's latent bug — indexing ``hidden_states[N]`` with N = number
of files already in the save dir (L41, L67) — is reproducible via
``replicate_dir_count_bug=True`` for bit-exact replays; by default
``n_layer`` is honored as documented.

Output contract: ``save_path/<utt>.pt`` float32 [T, D] torch tensors,
bit-compatible with the reference's consumers.
"""

from __future__ import annotations

import concurrent.futures as cf
import math
import os
from dataclasses import dataclass
from functools import partial
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import streaming
from ..utils import ptio


def _skip_existing(names: Sequence[str], save_path: str, stats) -> Sequence[str]:
    """SER_TPU_SKIP_EXISTING=1 → resume an interrupted extraction by
    skipping utterances whose ``.pt`` already exists (safe: the writer is
    atomic, utils/ptio.save_tensor). Off by default — the reference
    recomputes everything (preprocess_speech.py has no resume), and the
    ``replicate_dir_count_bug`` layer-select quirk depends on the save
    dir's file count, so resuming changes that mode's semantics."""
    if os.environ.get("SER_TPU_SKIP_EXISTING") != "1":
        return names
    def done(n):
        stem = os.path.splitext(os.path.basename(n))[0]
        return os.path.exists(os.path.join(save_path, f"{stem}.pt"))
    kept = [n for n in names if not done(n)]
    stats.n_skipped = len(names) - len(kept)
    return kept
from ..utils.audio import load_wav, normalize_waveform


def _shard_encoder_params(mesh, params):
    """Megatron sharding over the 'model' axis — the full recipe:

    - FFN: intermediate kernel column-parallel ``P(None, 'model')``,
      output kernel row-parallel ``P('model', None)``.
    - Attention: q/k/v kernels column-parallel (output dim D = H·hd is
      head-major, so an even head count per shard keeps whole heads
      local and SDPA communication-free) with their biases sharded to
      match; out_proj kernel row-parallel, closing each block with one
      partial-sum all-reduce like the FFN's.

    Per-head extras (WavLM's ``rel_attn_embed`` [buckets, H] and
    ``gru_rel_pos_const`` [1,H,1,1], the shared ``gru_rel_pos_linear``
    [hd, 8]) stay replicated — KBs against the MB-scale kernels; GSPMD
    slices them where the head dim is partitioned. Asserted at the HLO
    level by tests/test_collectives.py::TestTensorParallelCollectives
    (halved per-device kernel shapes present, full shapes absent).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    COL = ("intermediate_dense", "q_proj", "k_proj", "v_proj")
    ROW = ("output_dense", "out_proj")

    def spec(path, x):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        leaf = names[-1]
        if any(n in names for n in COL):
            if leaf == "kernel":
                return P(None, "model")
            if leaf == "bias":
                return P("model")
        if any(n in names for n in ROW) and leaf == "kernel":
            return P("model", None)
        return P()

    shardings = jax.tree_util.tree_map_with_path(
        lambda p, x: NamedSharding(mesh, spec(p, x)), params
    )
    return jax.tree.map(lambda x, s: jax.device_put(x, s), params, shardings)


@dataclass
class ExtractionStats:
    n_utts: int = 0
    n_failed: int = 0
    n_skipped: int = 0  # SER_TPU_SKIP_EXISTING resume (see _skip_existing)
    audio_seconds: float = 0.0
    wall_seconds: float = 0.0

    @property
    def utts_per_sec(self) -> float:
        return self.n_utts / self.wall_seconds if self.wall_seconds else 0.0


class SpeechExtractionPipeline:
    """wav dir → per-utterance SSL embeddings (WavLM / w2v2 / HuBERT)."""

    def __init__(
        self,
        model,  # SpeechEncoderModel
        params,
        config,  # SpeechConfig
        n_layer: int = -1,
        use_average: bool = False,
        do_normalize: bool = True,
        token_budget: Optional[int] = None,  # samples per batch; None =
        # size-aware default from hidden_size (v5e sweeps, 10-s utts):
        #   ≤1024 (wavlm-large):  320 s ≈ B=32 (B32 297.4 > B16 by ~4%)
        #   >1024 (hubert-XL 1280, w2v2-2B 1920): 160 s ≈ B=16
        #     (hubert 133.2 @B16 vs 117.1 @B32 — the old fixed 320-s
        #      budget cost 12%; w2v2 68.4 @B16 > 67.0 @B8 > 64.3 @B32)
        bucket_quantum: int = 16000,  # 1 s
        num_workers: int = 8,
        replicate_dir_count_bug: bool = False,
        n_devices: Optional[int] = None,
        model_parallel: int = 1,
    ):
        from ..parallel.mesh import make_mesh

        # model_parallel > 1: megatron-style FFN sharding over a 'model'
        # axis for encoders whose f32 params exceed per-chip HBM
        # (w2v2-XLS-R-2B; SURVEY.md §2.9)
        self.mesh = make_mesh(n_devices, model_parallel=model_parallel)
        self.n_data = self.mesh.shape["data"]
        self.model_parallel = model_parallel
        # extraction is inference-only: opt into the no-vjp Pallas
        # kernels on a config copy (the loader/engines stay neutral —
        # gradients require the XLA paths). DP runs per-shard under
        # shard_map where the custom call is local compute; the TP leg
        # (jit+NamedSharding GSPMD) must keep XLA, so only mp==1 flips.
        if model_parallel == 1 and not config.inference_kernels:
            import dataclasses as _dc

            config = _dc.replace(config, inference_kernels=True)
            model = model.clone(config=config)
        # fused [D,3D] qkv layout (exact relayout, models/speech.py
        # fuse_qkv_params): env opt-in until the hardware A/B
        # (scripts/exp_qkv_fused.py) decides the default. dp-only — the
        # TP sharding spec addresses the split q/k/v param names.
        if (
            os.environ.get("SER_TPU_FUSED_QKV") == "1"
            and model_parallel == 1
            and getattr(config, "fused_qkv", None) is False
        ):
            import dataclasses as _dc

            from ..models.speech import fuse_qkv_params

            config = _dc.replace(config, fused_qkv=True)
            model = model.clone(config=config)
            params = fuse_qkv_params(params)
        # fused conv-frontend prefix (ops/pallas/conv_frontend.py): a
        # module attr, dp-only like the kernels above. Depth comes from
        # default_fused_frontend (auto 0 until the hardware A/B lands).
        # SER_TPU_FRONTEND=xla|<n> forces either way; without it the
        # caller's explicit non-zero depth is respected.
        if model_parallel == 1:
            from ..models.speech import default_fused_frontend

            ff_depth = default_fused_frontend(config)
            cur = getattr(model, "fused_frontend", 0)
            forced = "SER_TPU_FRONTEND" in os.environ
            if (forced or cur == 0) and ff_depth != cur:
                model = model.clone(fused_frontend=ff_depth)
        self.model = model
        # bf16 mode: pre-cast the frozen params once (saves the per-step
        # f32→bf16 weight casts; norms still compute in f32 on bf16 inputs)
        if config.compute_dtype == jnp.bfloat16:
            params = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if getattr(x, "dtype", None) == np.float32 or getattr(x, "dtype", None) == jnp.float32
                else x,
                params,
            )
        from ..parallel.mesh import replicate as _replicate

        if model_parallel > 1:
            self.params = _shard_encoder_params(self.mesh, params)
        else:
            self.params = _replicate(self.mesh, params)
        self.config = config
        self.n_layer = n_layer
        self.use_average = use_average
        self.do_normalize = do_normalize
        if token_budget is None:
            token_budget = 16000 * (320 if config.hidden_size <= 1024 else 160)
        self.token_budget = token_budget
        self.bucket_quantum = bucket_quantum
        self.num_workers = num_workers
        self.replicate_dir_count_bug = replicate_dir_count_bug
        self._fwd_cache: Dict = {}

    # -- device step ---------------------------------------------------------

    def _forward(self, shape: Tuple[int, int], n_layer: int):
        key = (shape, n_layer, self.use_average)
        if key in self._fwd_cache:
            return self._fwd_cache[key]

        # D2H in the COMPUTE dtype: in bf16 mode the hidden states carry
        # bf16 precision anyway, so transferring f32 doubles bytes for no
        # information; the host casts to f32 for the .pt contract.
        out_dtype = self.config.compute_dtype

        def fwd(params, wav, mask):
            out = self.model.apply({"params": params}, wav, mask)
            hs = out["hidden_states"]
            if self.use_average:
                # mean of the last 4 hidden states (preprocess_speech.py:52-63)
                sel = (hs[-4] + hs[-3] + hs[-2] + hs[-1]) / 4.0
            else:
                sel = hs[n_layer]
            return sel.astype(out_dtype), out["frame_mask"]

        if self.n_data > 1 and self.model_parallel == 1:
            # DP leg as shard_map: each device traces the per-shard
            # program, so the measured-default Pallas kernels (oneshot2
            # attention; see ops/attention_core.under_manual_axis) stay
            # live on multi-chip extraction — under plain jit+NamedSharding
            # a Pallas custom call cannot partition and XLA would be
            # forced. Rows are already padded to a multiple of n_data.
            from jax.sharding import PartitionSpec as P

            fn = jax.jit(
                jax.shard_map(
                    fwd, mesh=self.mesh,
                    in_specs=(P(), P("data"), P("data")),
                    out_specs=(P("data"), P("data")),
                    check_vma=False,
                )
            )
        else:
            fn = jax.jit(fwd)
        self._fwd_cache[key] = fn
        return fn

    # -- host pipeline ---------------------------------------------------------

    def _load_one(self, wav_dir: str, name: str) -> Optional[np.ndarray]:
        path = os.path.join(wav_dir, name)
        try:
            y, _sr = load_wav(path, target_sr=16000)
            return normalize_waveform(y, self.do_normalize)
        except Exception as e:  # skip-and-log like the reference (L72-73)
            print(f"Failed to process {path}: {e}")
            return None

    def _plan(self, wav_dir: str, wav_names: Sequence[str], stats: ExtractionStats):
        """Header-only batch plan (no audio decoded; exact lengths).

        Header reads ride the worker pool — serial open/parse per file
        would put O(corpus) filesystem round-trips between process start
        and the first device batch (minutes on network filesystems at
        MSP-Podcast scale)."""

        def one(name: str) -> Optional[Tuple[str, int]]:
            try:
                return name, streaming.planned_wav_len(os.path.join(wav_dir, name))
            except Exception:
                # non-PCM/odd container: fall back to a full decode for the
                # length (rare; decoded again in the stream)
                w = self._load_one(wav_dir, name)
                return (name, len(w)) if w is not None else None

        with cf.ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            results = list(pool.map(one, wav_names))
        planned = [r for r in results if r is not None]
        stats.n_failed += len(results) - len(planned)
        return streaming.plan_batches(planned, self.token_budget, self.bucket_quantum)

    def run(self, wav_dir: str, save_path: str, wav_names: Optional[Sequence[str]] = None) -> ExtractionStats:
        """Streaming producer/consumer extraction with bounded host RAM.

        Decoder threads feed an assembler; the device loop dispatches batch
        k before fetching batch k-1 (JAX async dispatch ⇒ D2H overlaps
        compute); writer threads drain with backpressure. Host RSS is
        bounded by queue depth × batch bytes, independent of corpus size.
        """
        import time

        os.makedirs(save_path, exist_ok=True)
        n_layer = self.n_layer
        if self.replicate_dir_count_bug:
            n_layer = len(os.listdir(save_path))

        if wav_names is None:
            wav_names = sorted(os.listdir(wav_dir))
        stats = ExtractionStats()
        t0 = time.perf_counter()

        wav_names = _skip_existing(wav_names, save_path, stats)
        plan = self._plan(wav_dir, wav_names, stats)
        stream = streaming.BatchStream(
            partial(self._load_one, wav_dir), plan, self.bucket_quantum,
            row_multiple=self.n_data, num_workers=self.num_workers,
        )
        writer = streaming.BoundedWriter(num_workers=self.num_workers)
        from ..parallel.mesh import shard_batch

        def drain(item) -> None:
            rb, feats_dev, fmask_dev = item
            # bf16 crosses the wire (ml_dtypes view), f32 cast on host
            feats = np.asarray(jax.device_get(feats_dev)).astype(np.float32, copy=False)
            lengths = np.asarray(jax.device_get(fmask_dev)).sum(axis=1).astype(int)
            for i, name in enumerate(rb.names):
                stem = os.path.splitext(os.path.basename(name))[0]
                out = os.path.join(save_path, f"{stem}.pt")
                writer.submit(ptio.save_tensor, feats[i, : lengths[i]].copy(), out)
                stats.n_utts += 1
                stats.audio_seconds += rb.lengths[i] / 16000.0

        prev = None
        for rb in stream:
            stats.n_failed += rb.n_failed
            if not rb.names:
                continue
            fwd = self._forward(rb.wav.shape, n_layer)
            wav_d, mask_d = shard_batch(self.mesh, (jnp.asarray(rb.wav), jnp.asarray(rb.mask)))
            out = fwd(self.params, wav_d, mask_d)  # async dispatch — no block
            if prev is not None:
                drain(prev)  # D2H of k-1 overlaps device compute of k
            prev = (rb, *out)
        if prev is not None:
            drain(prev)
        writer.drain()
        stats.wall_seconds = time.perf_counter() - t0
        return stats


class WhisperExtractionPipeline:
    """wav dir → Whisper-encoder embeddings, truncated to true frame count.

    Reference semantics (preprocessing/preprocess_whisper.py:45-82): 30-s
    padded log-mel, encoder hidden_states[n_layer] (or mean-last-4),
    truncate to ``ceil(len(y)/320)`` frames. The log-mel frontend runs
    on-device inside the same jit as the encoder.
    """

    N_SAMPLES = 480000  # 30 s @ 16 kHz

    def __init__(
        self,
        model,  # WhisperEncoderModel
        params,
        config,  # WhisperEncoderConfig
        n_layer: int = -1,
        use_average: bool = False,
        batch_size: int = 8,
        num_workers: int = 8,
        n_devices: Optional[int] = None,
    ):
        from ..parallel.mesh import make_mesh, replicate as _replicate

        self.mesh = make_mesh(n_devices)
        self.n_data = self.mesh.shape["data"]
        # inference-only kernel opt-in (same rationale as the speech
        # pipeline; whisper extraction is always data-parallel)
        if not config.inference_kernels:
            import dataclasses as _dc

            config = _dc.replace(config, inference_kernels=True)
            model = model.clone(config=config)
        # fused qkv env opt-in (see SpeechExtractionPipeline)
        if (
            os.environ.get("SER_TPU_FUSED_QKV") == "1"
            and getattr(config, "fused_qkv", None) is False
        ):
            import dataclasses as _dc

            from ..models.whisper import fuse_qkv_params_whisper

            config = _dc.replace(config, fused_qkv=True)
            model = model.clone(config=config)
            params = fuse_qkv_params_whisper(params)
        self.model = model
        if config.compute_dtype == jnp.bfloat16:
            params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
        self.params = _replicate(self.mesh, params)
        self.config = config
        self.n_layer = n_layer
        self.use_average = use_average
        # batch rows padded to a multiple of the mesh data axis
        self.batch_size = ((batch_size + self.n_data - 1) // self.n_data) * self.n_data
        self.num_workers = num_workers
        self._fwd = None

    def _forward(self):
        if self._fwd is not None:
            return self._fwd

        from ..ops.mel import whisper_log_mel

        def fwd(params, wav):
            mel = whisper_log_mel(wav, num_mels=self.config.num_mel_bins)
            out = self.model.apply({"params": params}, mel)
            hs = out["hidden_states"]
            if self.use_average:
                sel = (hs[-4] + hs[-3] + hs[-2] + hs[-1]) / 4.0
            else:
                sel = hs[self.n_layer]
            return sel.astype(jnp.float32)

        if self.n_data > 1:
            # same shard_map rationale as SpeechExtractionPipeline._forward
            from jax.sharding import PartitionSpec as P

            self._fwd = jax.jit(
                jax.shard_map(
                    fwd, mesh=self.mesh, in_specs=(P(), P("data")),
                    out_specs=P("data"), check_vma=False,
                )
            )
        else:
            self._fwd = jax.jit(fwd)
        return self._fwd

    def run(self, wav_dir: str, save_path: str, wav_names: Optional[Sequence[str]] = None) -> ExtractionStats:
        """Streaming fixed-shape extraction (one compiled [B, 480000] step),
        double-buffered like SpeechExtractionPipeline.run."""
        import time

        os.makedirs(save_path, exist_ok=True)
        if wav_names is None:
            wav_names = sorted(os.listdir(wav_dir))
        stats = ExtractionStats()
        t0 = time.perf_counter()
        wav_names = _skip_existing(wav_names, save_path, stats)

        def load(name):
            try:
                y, _ = load_wav(os.path.join(wav_dir, name), target_sr=16000)
                return y
            except Exception as e:
                print(f"Failed to process {name}: {e}")
                return None

        # fixed-size chunks in name order (no length sort — every batch
        # compiles to the same [batch_size, 30 s] shape)
        bs = self.batch_size
        plan = [
            streaming.PlannedBatch(list(wav_names[i : i + bs]), [0] * len(wav_names[i : i + bs]))
            for i in range(0, len(wav_names), bs)
        ]
        stream = streaming.BatchStream(
            load, plan, bucket_quantum=self.N_SAMPLES, row_multiple=bs,
            num_workers=self.num_workers, fixed_len=self.N_SAMPLES,
        )
        writer = streaming.BoundedWriter(num_workers=self.num_workers)
        from ..parallel.mesh import shard_batch

        fwd = self._forward()

        def drain(item) -> None:
            rb, feats_dev = item
            feats = np.asarray(jax.device_get(feats_dev))
            for i, name in enumerate(rb.names):
                # true frame count, capped at the encoder's 1500 frames
                # (preprocess_whisper.py:50, 75-76)
                n_frames = min(math.ceil(rb.lengths[i] / 320), feats.shape[1])
                stem = os.path.splitext(os.path.basename(name))[0]
                out = os.path.join(save_path, f"{stem}.pt")
                writer.submit(ptio.save_tensor, feats[i, :n_frames].copy(), out)
                stats.n_utts += 1
                stats.audio_seconds += rb.lengths[i] / 16000.0

        prev = None
        for rb in stream:
            stats.n_failed += rb.n_failed
            if not rb.names:
                continue
            (wav_d,) = shard_batch(self.mesh, (jnp.asarray(rb.wav),))
            feats_dev = fwd(self.params, wav_d)  # async dispatch
            if prev is not None:
                drain(prev)
            prev = (rb, feats_dev)
        if prev is not None:
            drain(prev)
        writer.drain()
        stats.wall_seconds = time.perf_counter() - t0
        return stats


class TextExtractionPipeline:
    """transcript CSV → per-utterance text embeddings (RoBERTa / DeBERTa).

    Reference semantics (preprocessing/preprocess_roberta.py:45-76):
    tokenizer(padding='max_length', max_length=80, truncation), save the
    FULL padded [80, D] last_hidden_state (or mean-last-4) keyed by
    ``FileName``.
    """

    def __init__(
        self,
        model,
        params,
        tokenize: Callable[[List[str]], Dict[str, np.ndarray]],
        n_layer: int = -1,
        use_average: bool = False,
        max_length: int = 80,
        batch_size: int = 64,
        num_workers: int = 8,
        n_devices: Optional[int] = None,
    ):
        from ..parallel.mesh import make_mesh, replicate as _replicate

        self.mesh = make_mesh(n_devices)
        self.n_data = self.mesh.shape["data"]
        self.model = model
        self.params = _replicate(self.mesh, params)
        self.tokenize = tokenize
        self.n_layer = n_layer
        self.use_average = use_average
        self.max_length = max_length
        # static batches, rows a multiple of the data axis
        self.batch_size = ((batch_size + self.n_data - 1) // self.n_data) * self.n_data
        self.num_workers = num_workers
        self._fwd = None

    def _forward(self):
        if self._fwd is not None:
            return self._fwd

        def fwd(params, ids, mask):
            out = self.model.apply({"params": params}, ids, mask)
            hs = out["hidden_states"]
            if self.use_average:
                sel = (hs[-4] + hs[-3] + hs[-2] + hs[-1]) / 4.0
            else:
                sel = hs[self.n_layer]
            return sel.astype(jnp.float32)

        if self.n_data > 1:
            # same shard_map rationale as the speech/whisper pipelines
            from jax.sharding import PartitionSpec as P

            self._fwd = jax.jit(
                jax.shard_map(
                    fwd, mesh=self.mesh, in_specs=(P(), P("data"), P("data")),
                    out_specs=P("data"), check_vma=False,
                )
            )
        else:
            self._fwd = jax.jit(fwd)
        return self._fwd

    def run(self, names: Sequence[str], texts: Sequence[str], save_path: str) -> ExtractionStats:
        import time

        os.makedirs(save_path, exist_ok=True)
        stats = ExtractionStats()
        t0 = time.perf_counter()
        keep = _skip_existing(names, save_path, stats)
        if len(keep) < len(names):
            kept_set = set(keep)
            names, texts = zip(*[
                (n, t) for n, t in zip(names, texts) if n in kept_set
            ]) if keep else ((), ())
        # BoundedWriter backpressure: without it the fetched feature rows
        # (~0.5 MB each at deberta dims) pile up behind slow disks
        writer = streaming.BoundedWriter(num_workers=self.num_workers)
        fwd = self._forward()
        bs = self.batch_size
        for start in range(0, len(names), bs):
            chunk_names = list(names[start : start + bs])
            chunk_texts = [
                t if isinstance(t, str) else "" for t in texts[start : start + bs]
            ]
            toks = self.tokenize(chunk_texts)
            ids = np.asarray(toks["input_ids"])
            mask = np.asarray(toks["attention_mask"])
            if len(chunk_names) < bs:  # pad to static batch
                pad = bs - len(chunk_names)
                ids = np.concatenate([ids, np.repeat(ids[-1:], pad, 0)])
                mask = np.concatenate([mask, np.repeat(mask[-1:], pad, 0)])
            feats = np.asarray(fwd(self.params, jnp.asarray(ids), jnp.asarray(mask)))
            for i, name in enumerate(chunk_names):
                stem = os.path.splitext(os.path.basename(name))[0]
                out = os.path.join(save_path, f"{stem}.pt")
                writer.submit(ptio.save_tensor, feats[i].copy(), out)
                stats.n_utts += 1
        writer.drain()
        stats.wall_seconds = time.perf_counter() - t0
        return stats
