"""Construct the live event-scoring stack from trained runs.

Shared by the CLI (``segment --score-events``, ``eval-clips``) and the
serving daemon (``segment_start`` with a ``score_events`` config): load
the frozen stage-1 ChunkEncoder + trained stage-2 RATTHeadV2 from their
checkpoint runs and bind them, with a retrieval collection, into an
:class:`~vit_research_tpu.evaluate.live.LiveEventScorer`.

The reference's evaluation program rebuilt its model with explicit
sublayer builds and per-block pickle restores inline
(reference: nba_proj/test/get_clip_sequences.py:490-551); here the
loaders are one shared module so every surface gets the same strict
misconfiguration checks. Errors raise :class:`ScoringUnavailable`
(a ``ValueError``): the CLI converts it to ``SystemExit``, the daemon
to an ``{"ok": false}`` protocol reply — a bad run id must never
surface as a random-weight head silently scoring plausible-looking
garbage rows (or as a killed daemon connection).
"""

from __future__ import annotations

import os


class ScoringUnavailable(ValueError):
    """A scoring component cannot be loaded as configured (missing or
    corrupt checkpoint run, absent vector store, chunk-size mismatch)."""


def restore_best(what: str, ckpt, run_id, *, strict: bool):
    """``restore_best`` of a run, or None without a run_id. A MISSING
    run falls back to fresh params with a console note for non-strict
    callers (the historical eval-clips behavior); strict callers (live
    event scoring) get a :class:`ScoringUnavailable`. A run that exists
    but FAILS to restore is fatal for everyone — random weights would
    produce plausible-looking garbage rows."""
    from vit_research_tpu.train.checkpoint import CheckpointManager

    if not run_id:
        return None
    # CheckpointManager's constructor creates the run dir eagerly; probe
    # first so a typo'd run id fails instead of materializing as an
    # empty run directory
    if not os.path.isdir(os.path.join(ckpt, str(run_id))):
        msg = f"[{what}] no run directory {os.path.join(ckpt, str(run_id))}"
        if strict:
            raise ScoringUnavailable(
                msg + " — pass the run id printed by the training command "
                "(ls the --ckpt root)")
        print(msg + "; using fresh params")
        return None
    try:
        restored = CheckpointManager(ckpt, run_id).restore_best()
    except Exception as e:  # noqa: BLE001 - diagnose instead of crash
        raise ScoringUnavailable(
            f"[{what}] checkpoint restore of {run_id!r} failed: {e} "
            "(see MIGRATING.md for checkpoint layout changes)")
    if restored is None:
        msg = (f"[{what}] run {run_id!r} under {ckpt!r} has no best "
               "checkpoint (did training finish an epoch?)")
        if strict:
            raise ScoringUnavailable(msg)
        print(msg + "; using fresh params")
    return restored


def stage1_encode_batch(dim: int, t: int, ckpt, run_id, *,
                        strict: bool = False):
    """Frozen stage-1 ChunkEncoder as a raw (B, T, D) -> (embs, logits)
    callable; restored from ``run_id`` when given (store-free — the
    live-event path encodes chunks that are in no frame store yet).
    ``strict=True`` makes a missing restore a hard error instead of
    silently scoring with randomly-initialized weights."""
    import jax
    import jax.numpy as jnp

    from vit_research_tpu.models.heads import ChunkEncoder
    from vit_research_tpu.train.train_chunk_encoder import make_encode_fn
    from vit_research_tpu.utils.configs import ChunkEncoderConfig

    cfg = ChunkEncoderConfig(embed_dim=dim, mlp_dim=4 * dim, max_len=t)
    model = ChunkEncoder(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, t, cfg.embed_dim)))
    restored = restore_best("stage-1", ckpt, run_id, strict=strict)
    if restored is not None:
        params = restored["params"]
        # the restored pos_embedding table encodes the chunk size the
        # encoder was TRAINED with ((1, 1+max_len, D)); ChunkEncoder's
        # `pos[:, :t+1]` slice would silently accept a smaller window
        # and score out-of-distribution chunks against a store built
        # with the trained size
        inner = params.get("params", params)
        pos = inner.get("pos_embedding") if hasattr(inner, "get") else None
        if pos is not None and int(pos.shape[1]) != t + 1:
            raise ScoringUnavailable(
                f"[stage-1] run {run_id!r} was trained with chunk_size "
                f"{int(pos.shape[1]) - 1} (pos_embedding "
                f"{tuple(pos.shape)}), but this command is chunking with "
                f"chunk_size {t} — pass the matching --chunk-size, or "
                "retrain/rebuild with the new size")
    return make_encode_fn(model, params)


def stage2_head(dim: int, ckpt, run_id, *, k_sim: int, k_contrast: int,
                k_temporal: int, strict: bool = False):
    """Stage-2 RATTHeadV2 as ``apply(query, sim, contrast, temporal) ->
    (B, 1) logits``; restored from ``run_id`` when given
    (reference model: nba_proj/models/ratt_v2.py:629-771)."""
    import jax
    import jax.numpy as jnp

    from vit_research_tpu.models.ratt_v2 import RATTHeadV2
    from vit_research_tpu.utils.configs import HeadConfig

    head_cfg = HeadConfig(embed_dim=dim, k_sim=k_sim, k_contrast=k_contrast,
                          k_temporal=k_temporal)
    head = RATTHeadV2(head_cfg)
    h_params = head.init(
        jax.random.PRNGKey(0), jnp.zeros((1, dim)),
        jnp.zeros((1, k_sim, dim)), jnp.zeros((1, k_contrast, dim)),
        jnp.zeros((1, k_temporal, dim)))
    restored = restore_best("stage-2", ckpt, run_id, strict=strict)
    if restored is not None:
        h_params = restored["params"]
    return lambda q, s, c, tm: head.apply(h_params, q, s, c, tm)[0]


def open_collection(db_path, name):
    """Open an EXISTING collection for read-side consumers (strict both
    ways): PersistentClient creates its root directory eagerly, so a
    typo'd store path would be materialized on disk as an empty store
    before the collection lookup even fails — probe first. A typo'd
    NAME must likewise not evaluate against an empty just-created
    collection (get_collection raises, never creates)."""
    from vit_research_tpu.store.vector_store import PersistentClient

    if not os.path.isdir(db_path):
        raise ScoringUnavailable(
            f"no vector store at {db_path!r} — the store root must "
            "already exist (see write-frame-db / write-clips-to-ragdb)")
    try:
        return PersistentClient(db_path, autoflush=False).get_collection(name)
    except ValueError as e:
        raise ScoringUnavailable(str(e))


def load_scorer_stack(*, dim: int, ckpt, stage1_run_id, stage2_run_id,
                      chunk_size: int = 8, k_sim: int = 8,
                      k_contrast: int = 8, k_temporal: int = 4):
    """Restore the trained-weight callables of the live scorer — the
    frozen stage-1 ChunkEncoder ``encode_batch`` and the stage-2
    RATTHeadV2 ``head_apply`` — from their checkpoint runs (both STRICT:
    a missing checkpoint raises, never a silent fall-back to random
    weights). Pure functions closing over the restored params: safe to
    share across concurrent scorer sessions, and the unit the serving
    daemon's ``reload_weights`` op swaps (per-session state lives in
    :class:`~vit_research_tpu.evaluate.live.LiveEventScorer`, not
    here)."""
    if chunk_size < 1:
        raise ScoringUnavailable("event scoring needs positive chunk_size")
    encode_batch = stage1_encode_batch(dim, chunk_size, ckpt,
                                       stage1_run_id, strict=True)
    head_apply = stage2_head(dim, ckpt, stage2_run_id, k_sim=k_sim,
                             k_contrast=k_contrast, k_temporal=k_temporal,
                             strict=True)
    return encode_batch, head_apply


def make_live_scorer(embed_fn, *, dim: int, ckpt=None, stage1_run_id=None,
                     stage2_run_id=None, db=None, collection,
                     chunk_size: int = 8,
                     chunk_stride: int = 2, k_sim: int = 8,
                     k_contrast: int = 8, k_temporal: int = 4,
                     future_step: int = 2, emb_cache_cap: int | None = None,
                     stack=None):
    """The full live make/miss scorer from its trained runs — frozen
    stage-1 encoder + trained stage-2 head (both STRICT: a missing
    checkpoint raises, never a silent fall-back to random weights) +
    live retrieval against ``collection`` in ``db`` — the offline
    eval-clips stack, applied per finished clip (evaluate/live.py).

    ``collection`` is a name looked up in ``db``, or an already-open
    collection object (callers that must stage the host-side store read
    separately from the model init — e.g. the daemon opens outside its
    device lock). ``stack`` is an already-restored
    ``(encode_batch, head_apply)`` pair from :func:`load_scorer_stack`
    (callers that cache/swap weights across sessions — the daemon);
    without it the checkpoint args are restored here."""
    from vit_research_tpu.evaluate.live import LiveEventScorer

    if chunk_size < 1 or chunk_stride < 1:
        raise ScoringUnavailable(
            "event scoring needs positive chunk_size and chunk_stride")
    col = (collection if hasattr(collection, "query")
           else open_collection(db, collection))
    if stack is None:
        stack = load_scorer_stack(
            dim=dim, ckpt=ckpt, stage1_run_id=stage1_run_id,
            stage2_run_id=stage2_run_id, chunk_size=chunk_size,
            k_sim=k_sim, k_contrast=k_contrast, k_temporal=k_temporal)
    encode_batch, head_apply = stack
    return LiveEventScorer(
        embed_fn, encode_batch, head_apply, col,
        chunk_size=chunk_size, chunk_stride=chunk_stride,
        k_sim=k_sim, k_contrast=k_contrast, k_temporal=k_temporal,
        future_step=future_step, emb_cache_cap=emb_cache_cap)
