"""Batched, data-parallel frame-embedding engine.

Replaces the reference's per-frame / per-128-frame ``model.predict`` loops
and the ``tf.numpy_function`` TF<->PyTorch bridge
(reference: nba_proj/write_per_vid_embeddings_chroma.py:207-265,
nba_proj/train/training.py:150-155, nba_proj/chroma.py:196-254,
nba_proj/db_maintainence/build_embeddings_store.py:102-126 — the
``hf_vit_embed_batch`` duplicated across 8 files) with one engine:

- host threads decode JPEGs into pinned uint8 batches (the only host work);
- normalize+patchify+project run fused on device (ops/patch_embed.py);
- the ViT forward runs under ``jit`` with batch dim sharded over the mesh
  'data' axis — XLA inserts the all-gather-free SPMD partitioning, scaling
  embedding throughput linearly over ICI;
- fixed batch shape => one compile; ragged tails are padded and sliced;
- dispatch is async: batch N+1 decodes on the host while batch N runs.

Output contract matches the reference embedders: the chosen endpoint
(CLS-pooled by default), optionally L2-normalized
(reference: nba_proj/train/training.py:57-60 normalizes; the random-ViT
writers store raw ``pre_logits``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from vit_research_tpu.data.preprocess import (
    PreprocessSpec,
    load_frames,
)
from vit_research_tpu.ops.patch_embed import fused_patch_embed
from vit_research_tpu.parallel import mesh as mesh_lib


class EmbeddingEngine:
    def __init__(self, model, params, spec: PreprocessSpec, *,
                 mesh=None, batch_size: int = 256, endpoint: str = "pooled",
                 l2_normalize: bool = True, use_fused_patch_embed: bool = True,
                 interpret_pallas: bool = False):
        self.model = model
        self.params = params
        self.spec = spec
        self.mesh = mesh
        self.endpoint = endpoint
        self.l2_normalize = l2_normalize
        self.use_fused = use_fused_patch_embed
        self.interpret = interpret_pallas
        c = model.config
        self.grid = (spec.size[0] // c.patch_size, spec.size[1] // c.patch_size)

        if mesh is not None:
            n_data = mesh.shape["data"]
            # Keep per-device batches whole.
            batch_size = mesh_lib.pad_to_multiple(batch_size, n_data)
        self.batch_size = batch_size

        # Derive the output shape abstractly (no compile): token endpoints
        # ('encoded_tokens', or 'pooled' with pooler='none') are rank 3,
        # pooled ones rank 2 — the sharding rank and the N == 0 fallback
        # shape must follow the endpoint, not assume (N, D).
        out_aval = jax.eval_shape(
            self._forward, params,
            jax.ShapeDtypeStruct(
                (batch_size, spec.size[0], spec.size[1], 3), jnp.uint8))
        #: per-example output shape (keeps the (N, ...) contract for N == 0)
        self.out_trailing = tuple(out_aval.shape[1:])
        #: output embedding width (last axis)
        self.out_dim = self.out_trailing[-1]

        if mesh is not None:
            in_sh = (mesh_lib.replicated(mesh), mesh_lib.data_sharding(mesh, 4))
            out_sh = mesh_lib.data_sharding(mesh, len(out_aval.shape))
            self._jitted = jax.jit(self._forward,
                                   in_shardings=in_sh, out_shardings=out_sh)
            self._pad_jit = jax.jit(
                self._pad_to_batch,
                in_shardings=(mesh_lib.data_sharding(mesh, 4),),
                out_shardings=mesh_lib.data_sharding(mesh, 4))
        else:
            self._jitted = jax.jit(self._forward)
            self._pad_jit = jax.jit(self._pad_to_batch)

    # ------------------------------------------------------------- forward

    def _forward(self, params, images_u8):
        c = self.model.config
        spec = self.spec
        dtype = jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32
        if spec.grayscale:
            # The reference's USE_GRAYSCALE ablation, applied where the
            # reference applies it — inside the embedder (reference:
            # nba_proj/train/training_chunk_cached.py:473-505,
            # nba_proj/db_maintainence/db_rebuild_chunk.py:101-115).
            # uint8 semantics (clip + truncating cast) so both branches
            # see the same bytes the host oracle produces; stays uint8 so
            # the fused patch-embed path ships 1/3-width HBM traffic.
            # uint8->f32 routed via int32 (Mosaic has no direct cast).
            from vit_research_tpu.data.preprocess import LUMA_WEIGHTS

            # precision='highest': the TPU backend's default bf16 matmul
            # passes would round 0.5870 -> ~0.58594 (~1.1e-3), enough to
            # push luminances sitting just above an integer boundary one
            # gray level off the host oracle after the truncating cast.
            # This dot is 3 elements wide — HIGHEST costs nothing here
            # (unlike the pathological 131k-row top_k case, BENCH_NOTES).
            gray = jnp.tensordot(
                images_u8.astype(jnp.int32).astype(jnp.float32),
                jnp.asarray(LUMA_WEIGHTS, jnp.float32), axes=(-1, -1),
                precision=jax.lax.Precision.HIGHEST)
            gray = jnp.clip(gray, 0, 255).astype(jnp.uint8)
            images_u8 = jnp.stack([gray, gray, gray], axis=-1)
        if self.use_fused:
            p_conv = params["params"]["patch_embed"]
            k = p_conv["kernel"]  # (P, P, C, D) HWIO
            w = k.reshape(-1, k.shape[-1]).astype(jnp.float32)
            tokens = fused_patch_embed(
                images_u8, w, p_conv["bias"].astype(jnp.float32),
                patch_size=c.patch_size, rescale=spec.rescale,
                mean=spec.mean, std=spec.std, out_dtype=dtype,
                use_pallas=True, interpret=self.interpret)
            out = self.model.apply(
                params, tokens, self.grid,
                method=type(self.model).encode_patch_tokens)
        else:
            x = images_u8.astype(jnp.float32) * spec.rescale
            x = (x - jnp.asarray(spec.mean)) / jnp.asarray(spec.std)
            out = self.model.apply(params, x)
        emb = out[self.endpoint].astype(jnp.float32)
        if self.l2_normalize:
            emb = emb / jnp.maximum(
                jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
        return emb

    # --------------------------------------------------------------- entry

    def _pad_to_batch(self, small_u8):
        """Zero-pad a partial batch up to the static batch size ON DEVICE.
        Retraces once per bucket shape (a handful of power-of-two sizes);
        the pad itself is pure data movement, compiled in seconds."""
        return jnp.pad(small_u8, ((0, self.batch_size - small_u8.shape[0]),
                                  (0, 0), (0, 0), (0, 0)))

    def _transfer_bucket(self, n: int):
        """Smallest power-of-two transfer size covering ``n`` frames, or
        ``None`` when host-padding to the full batch is just as cheap.

        Rationale: the forward jit has ONE static batch shape, so a
        16-frame serve request used to ship a full host-padded batch to
        the device — e.g. 512x224x224x3 uint8 = 77 MB of ~97% zeros per
        dispatch, which dominates end-to-end latency whenever the
        host->device link (PCIe, or the dev tunnel) is the bottleneck.
        Instead we transfer only a small bucket and zero-pad on device,
        so bytes moved scale with offered load, not engine batch size.
        Buckets are powers of two (>= 32) to bound pad-jit retraces."""
        bucket = 32
        while bucket < n:
            bucket *= 2
        if self.mesh is not None:
            bucket = mesh_lib.pad_to_multiple(bucket, self.mesh.shape["data"])
        return bucket if bucket < self.batch_size else None

    def _dispatch(self, batch_u8: np.ndarray):
        """Pad to the static batch size and dispatch (async)."""
        n = batch_u8.shape[0]
        bucket = self._transfer_bucket(n)
        if bucket is not None:
            if n < bucket:
                pad = np.zeros((bucket - n, *batch_u8.shape[1:]),
                               batch_u8.dtype)
                batch_u8 = np.concatenate([batch_u8, pad], axis=0)
            if self.mesh is not None:
                batch_u8 = jax.device_put(
                    batch_u8, mesh_lib.data_sharding(self.mesh, 4))
            batch_u8 = self._pad_jit(batch_u8)
        else:
            if n < self.batch_size:
                pad = np.zeros((self.batch_size - n, *batch_u8.shape[1:]),
                               batch_u8.dtype)
                batch_u8 = np.concatenate([batch_u8, pad], axis=0)
            if self.mesh is not None:
                batch_u8 = jax.device_put(
                    batch_u8, mesh_lib.data_sharding(self.mesh, 4))
        return self._jitted(self.params, batch_u8), n

    def warmup(self, buckets=None) -> None:
        """Compile the forward jit and the device-pad jits for EVERY
        small-request bucket shape up front (default: all power-of-two
        buckets below the batch size — exactly the set _transfer_bucket
        can produce), so neither the first full batch nor the first
        small request of any size pays a cold trace/compile (matters for
        serving daemons: over a slow compile link a cold bucket adds
        whole-request latency spikes). Zero-frame warmups keep it cheap;
        the returned embeddings are host arrays, so each call is a real
        completion barrier."""
        if buckets is None:
            buckets, b = [], 32
            while b < self.batch_size:
                buckets.append(b)
                b *= 2
        full = np.zeros((self.batch_size, *self.spec.size, 3), np.uint8)
        self.embed_batch(full)
        for b in sorted(set(buckets)):
            if 0 < b < self.batch_size:
                self.embed_batch(full[:b])

    def embed_batch(self, batch_u8: np.ndarray) -> np.ndarray:
        """(B, H, W, 3) uint8 -> (B, D) float32 embeddings. B can exceed
        the engine batch size; sub-batches pipeline through _drain (at
        most one batch in flight — dispatching ALL sub-batches up front
        would hold the full input set in HBM at once, an OOM risk for a
        50k-frame serve request)."""
        return self._drain(batch_u8[s:s + self.batch_size]
                           for s in range(0, len(batch_u8), self.batch_size))

    def embed_paths(self, paths, num_workers: int = 8,
                    use_native: bool = False,
                    prefetch: int = 2) -> np.ndarray:
        """Decode -> embed with full host/device overlap.

        A producer thread decodes up to ``prefetch`` batches ahead into a
        bounded queue (double buffering), so JPEG decode keeps running
        while the main thread blocks on device readback — neither side
        ever waits on the other unless the pipeline is genuinely decode-
        or compute-bound. ``use_native`` routes JPEG decode through
        native/jpeg_fast.c. ``prefetch=0`` decodes inline (the pre-
        double-buffer behavior, still with async dispatch)."""
        import queue
        import threading

        if len(paths) == 0:
            return np.zeros((0, *self.out_trailing), np.float32)

        if prefetch <= 0:
            batches = (_timed_load(paths[s:s + self.batch_size], self.spec,
                                   num_workers, use_native)
                       for s in range(0, len(paths), self.batch_size))
            return self._drain(batches)

        q: "queue.Queue" = queue.Queue(maxsize=prefetch)
        _done = object()
        stop = threading.Event()  # set when the consumer abandons the run

        def _put(item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            try:
                for s in range(0, len(paths), self.batch_size):
                    if not _put(_timed_load(
                            paths[s:s + self.batch_size], self.spec,
                            num_workers, use_native)):
                        return
                _put(_done)
            except BaseException as e:  # surfaced on the consumer side
                _put(e)

        t = threading.Thread(target=produce, daemon=True,
                             name="embed-decode-prefetch")
        t.start()

        def consume():
            while True:
                item = q.get()
                if item is _done:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item

        try:
            return self._drain(consume())
        finally:
            # On an early exit (dispatch error) unblock the producer and
            # release any decoded batches it parked in the queue.
            stop.set()
            while True:
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
            t.join(timeout=30.0)

    def _drain(self, batches) -> np.ndarray:
        """Dispatch an iterable of uint8 batches, keeping one batch in
        flight on the device while the next is produced."""
        from vit_research_tpu.utils import profiling

        outs, pending = [], None
        for batch in batches:
            if pending is not None:
                dev_out, n = pending
                with profiling.span("embed.readback"):
                    outs.append(np.asarray(dev_out)[:n])
            with profiling.span("embed.dispatch"):
                pending = self._dispatch(batch)
        if pending is not None:
            dev_out, n = pending
            with profiling.span("embed.readback"):
                outs.append(np.asarray(dev_out)[:n])
        return (np.concatenate(outs, axis=0) if outs
                else np.zeros((0, *self.out_trailing), np.float32))


def _timed_load(paths, spec, num_workers, use_native):
    """load_frames under a 'embed.decode' profiling span (SURVEY.md
    section 5.1: per-stage timing in the embedding engine; no-op unless
    VRT_PROFILE is set)."""
    from vit_research_tpu.utils import profiling

    with profiling.span("embed.decode"):
        return load_frames(paths, spec, num_workers=num_workers,
                           use_native=use_native)


# Default novelty gate for refined strided embedding: cosine DISTANCE
# between a gap's two bounding keyframe embeddings above which the gap's
# interior frames are embedded exactly instead of interpolated. Static
# broadcast content sits well under this (adjacent-keyframe novelty
# ~1e-3 on the dossier world); event onsets / cuts / fast motion sit
# well above it (the 6-frame event marker moves the embedding by >0.1
# cosine). Measured in examples/quality_fast_profile.py's refined rows.
REFINE_THRESHOLD_DEFAULT = 0.05


def embed_video_strided(engine: "EmbeddingEngine", paths, *, stride: int = 2,
                        interpolate: bool = True,
                        num_workers: int = 8,
                        use_native: bool = False,
                        refine_threshold: float | None = None,
                        refine_radius: int = 0,
                        stats: dict | None = None) -> np.ndarray:
    """Temporally-strided embedding with inter-frame reuse.

    Consecutive broadcast frames are nearly identical, so embedding every
    frame wastes ViT forward passes (the insight behind inter-frame
    computation-reuse designs such as ResidualViT and Deja Vu — see
    PAPERS.md). This embeds every ``stride``-th frame exactly and linearly
    interpolates the embeddings in between — downstream consumers (kNN
    votes + HMM smoothing, chunk mean-pools) are smooth in embedding
    space, and the HMM's transition prior absorbs the interpolation noise.
    Effective throughput multiplies by ~``stride`` for the
    embed+segment path (BASELINE.md: <5 s per 10-min video).

    **Novelty-gated refinement** (``refine_threshold``): plain
    interpolation smears short events on fast-changing content — the
    adversarial dossier world measured event hit@1 collapsing to 0.0 at
    stride 4 (BENCH_NOTES.md "Adversarial (high-entropy) dossier world").
    When ``refine_threshold`` is set, any gap whose two bounding keyframe
    embeddings disagree by more than that cosine distance — i.e. the
    content changed, so linear interpolation is not trustworthy there —
    gets its interior frames embedded exactly in one extra batched
    forward; quiet gaps keep the stride speedup. ``refine_radius``
    additionally refines that many neighbouring gaps on each side (an
    event straddling a keyframe can leave one adjacent gap looking
    quiet).

    LIMIT — the gate only sees what keyframes see: an event SHORTER
    than ``stride`` that starts and ends strictly inside one gap
    touches no keyframe, so no key embedding changes and the gap stays
    quiet — invisible to refinement (and equally smeared by plain
    strided mode). Any event of length >= ``stride`` necessarily
    contains a keyframe, so the deployment rule is: choose ``stride``
    <= the shortest event you need localized.

    The cost is data-dependent: near-zero on static content,
    approaching full-rate on content that changes every frame — which is
    exactly when full-rate is the right answer. ``stats``, if given,
    receives ``gaps`` / ``refined_gaps`` / ``refined_frames`` /
    ``novelty_p50`` / ``novelty_max`` for cost accounting.

    Returns (N, D) embeddings aligned with ``paths``.
    """
    import time as _time

    if stride <= 0:
        raise ValueError(f"stride must be positive, got {stride}")
    if refine_radius < 0:
        raise ValueError(f"refine_radius must be >= 0, got {refine_radius}")
    n = len(paths)
    if n == 0:
        return np.zeros((0, engine.out_dim), np.float32)
    key_idx = list(range(0, n, stride))
    if key_idx[-1] != n - 1:
        key_idx.append(n - 1)
    t0 = _time.monotonic()
    key_embs = engine.embed_paths([paths[i] for i in key_idx],
                                  num_workers=num_workers,
                                  use_native=use_native)
    t_keys = _time.monotonic() - t0
    d = key_embs.shape[1]

    refined: dict[int, np.ndarray] = {}
    novelty = None
    refine_idx: list[int] = []
    hot_gaps = 0
    if refine_threshold is not None and len(key_idx) > 1:
        a, b = key_embs[:-1], key_embs[1:]
        den = (np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1))
        novelty = 1.0 - np.sum(a * b, axis=1) / np.maximum(den, 1e-12)
        hot = novelty > refine_threshold
        if refine_radius and hot.any():
            dilated = hot.copy()
            for off in range(1, refine_radius + 1):
                dilated[off:] |= hot[:-off]
                dilated[:-off] |= hot[off:]
            hot = dilated
        hot_gaps = int(hot.sum())
        refine_idx = [i for j in np.nonzero(hot)[0]
                      for i in range(key_idx[j] + 1, key_idx[j + 1])]
        if refine_idx:
            t0 = _time.monotonic()
            exact = engine.embed_paths([paths[i] for i in refine_idx],
                                       num_workers=num_workers,
                                       use_native=use_native)
            t_refine = _time.monotonic() - t0
            refined = dict(zip(refine_idx, exact))
    # Populate cost accounting whenever the caller asked for it — including
    # degenerate single-key inputs where the refine gate has no gaps to
    # inspect (ADVICE r4: the elif-only fallback left stats empty there).
    if stats is not None:
        stats.update(gaps=max(len(key_idx) - 1, 0), refined_gaps=hot_gaps,
                     refined_frames=len(refine_idx), keys=len(key_idx),
                     keys_s=round(t_keys, 3))
        if refined:
            stats["refine_embed_s"] = round(t_refine, 3)
        if novelty is not None:
            stats.update(novelty_p50=float(np.median(novelty)),
                         novelty_max=float(novelty.max()))

    out = np.empty((n, d), np.float32)
    if not interpolate:
        # Hold each keyframe's embedding until the next (zero-order hold).
        for j, i in enumerate(key_idx):
            end = key_idx[j + 1] if j + 1 < len(key_idx) else n
            out[i:end] = key_embs[j]
        for i, e in refined.items():
            out[i] = e
        return out
    for j in range(len(key_idx) - 1):
        i0, i1 = key_idx[j], key_idx[j + 1]
        span = i1 - i0
        w = np.arange(span, dtype=np.float32)[:, None] / span
        out[i0:i1] = (1.0 - w) * key_embs[j] + w * key_embs[j + 1]
    out[n - 1] = key_embs[-1]
    for i, e in refined.items():
        out[i] = e
    if engine.l2_normalize:
        out /= np.maximum(np.linalg.norm(out, axis=1, keepdims=True), 1e-12)
    return out


def strided_interp_device(key_embs, stride: int, n: int,
                          l2_normalize: bool = True):
    """Device-side twin of :func:`embed_video_strided`'s interpolation.

    ``key_embs``: (K, D) keyframe embeddings for key positions
    ``[0, stride, ..., n - stride, n - 1]`` (the key layout
    embed_video_strided produces when ``stride`` divides ``n``; at
    ``stride == 1`` that layout is simply every frame, n keys, no tail);
    returns (n, D) linearly interpolated embeddings, numerically matching
    the host loop (tests/test_strided_embed.py pins the equivalence). Jit-
    friendly: everything is static-shape broadcasting, so the full
    embed->interp->kNN->Viterbi segment path can stay on device
    (examples/bench_e2e_segment.py)."""
    if n % stride != 0:
        raise ValueError(f"stride {stride} must divide n {n}")
    if stride == 1:
        # range(0, n, 1) already ends at n-1, so the host layout appends
        # no tail key: the keys ARE the per-frame embeddings.
        if key_embs.shape[0] != n:
            raise ValueError(f"expected {n} keys for n={n} stride=1, "
                             f"got {key_embs.shape[0]}")
        out = key_embs.astype(jnp.float32)
        if l2_normalize:
            out = out / jnp.maximum(
                jnp.linalg.norm(out, axis=1, keepdims=True), 1e-12)
        return out
    u = n // stride  # uniform keys; key_embs has u + 1 rows (tail key)
    if key_embs.shape[0] != u + 1:
        raise ValueError(f"expected {u + 1} keys for n={n} stride={stride}, "
                         f"got {key_embs.shape[0]}")
    uni = key_embs[:u].astype(jnp.float32)
    w = jnp.arange(stride, dtype=jnp.float32)[:, None] / stride
    body = (uni[:-1, None, :] * (1.0 - w) + uni[1:, None, :] * w)
    body = body.reshape((u - 1) * stride, key_embs.shape[1])
    wt = (jnp.arange(stride - 1, dtype=jnp.float32)[:, None]
          / max(stride - 1, 1))
    tail = (uni[-1] * (1.0 - wt)
            + key_embs[-1].astype(jnp.float32) * wt)
    out = jnp.concatenate(
        [body, tail, key_embs[-1:].astype(jnp.float32)], axis=0)
    if l2_normalize:
        out = out / jnp.maximum(
            jnp.linalg.norm(out, axis=1, keepdims=True), 1e-12)
    return out


def make_hf_frame_embedder(params=None, *, spec=None, mesh=None,
                           batch_size: int = 256, seed: int = 0,
                           interpret_pallas: bool = False,
                           tome_r: int = 0,
                           gemm_quant: str | None = None,
                           gemm_quant_scales=(),
                           grayscale: bool = False) -> EmbeddingEngine:
    """The ``hf_vit_embed_batch`` capability as one engine: ViT-B/16 @224,
    CLS token, L2-normalized (reference: nba_proj/train/training.py:37-60).
    Uses imported HF weights when provided, else the seeded-init contract.
    ``tome_r`` enables token merging (ops/tome.py) and ``gemm_quant``
    int8 encoder GEMMs (ops/quant.py) — non-parity speed knobs; the
    weight tree is unchanged, so imported/seeded params still load.
    ``grayscale`` embeds luminance-converted frames — the reference's
    USE_GRAYSCALE ablation (nba_proj/db_maintainence/db_rebuild_chunk.py:
    101-115); ignored when an explicit ``spec`` is passed (set it there)."""
    import dataclasses

    from vit_research_tpu.data.preprocess import HF_VIT_SPEC
    from vit_research_tpu.models.hf_import import HF_VIT_B16_224
    from vit_research_tpu.models.vit import init_vit

    if spec is None and grayscale:
        spec = dataclasses.replace(HF_VIT_SPEC, grayscale=True)
    cfg = (dataclasses.replace(HF_VIT_B16_224, tome_r=tome_r,
                               gemm_quant=gemm_quant,
                               gemm_quant_scales=tuple(gemm_quant_scales))
           if (tome_r or gemm_quant) else HF_VIT_B16_224)
    model, init_params = init_vit(cfg, seed=seed,
                                  interpret_pallas=interpret_pallas)
    return EmbeddingEngine(
        model, params or init_params, spec or HF_VIT_SPEC, mesh=mesh,
        batch_size=batch_size, endpoint="pooled", l2_normalize=True,
        interpret_pallas=interpret_pallas)
