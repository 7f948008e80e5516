"""Cross-encoder rerank-quality training + evaluation harness.

Closes the last parity-evidence gap vs the reference's core scorer
(``/root/reference/src/reranker/classical.py:45-77``: a *pretrained*
torch CrossEncoder): this environment has no weight downloads, so the
claim "a classical reranker that beats embedding cosine" must be
proven by TRAINING the JAX cross-encoder
(``models/cross_encoder.py``) and measuring rerank quality against
the cosine scorer the ClassicalReranker actually falls back to
(HashEmbedder(256) cosine — ``reranker/classical.py:76,89``).

Protocol (mirrors the recall_eval harness):
  * deterministic transcript corpus (``pipeline/corpus_gen.py``),
    split by EPISODE so eval queries target chunks the trainer never
    saw;
  * train on (query, chunk, label) pairs — positives are paraphrased
    queries of the chunk, negatives are same-topic chunks (hard: the
    model must use the chunk-identifying rare tokens, not just the
    topic vocabulary) and random chunks (easy);
  * eval: for each held-out chunk, rank a candidate set of the true
    chunk + same-topic + random distractors; report top-1 accuracy,
    MRR and nDCG@10 (single relevant doc: 1/log2(1+rank)).

``python -m qrag_tpu.models.rerank_eval`` runs the full-size version
and prints JSON; ``--weights-dir`` ships the weights in the
ClassicalReranker's cache layout so ``method="cross-encoder"`` +
``model_cache_dir`` picks them up directly.  Tests run a tiny config
(tests/test_rerank_quality.py).
"""

from __future__ import annotations

import json
import logging
import math
import os
import time
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from qrag_tpu.pipeline.corpus_gen import (
    Chunk,
    generate_corpus,
    make_query,
    split_by_episode,
)

logger = logging.getLogger(__name__)


def resolve_init_from(path: Optional[str]) -> Optional[str]:
    """Resolve the warm-start artifact directory to an absolute path.

    Relative paths are tried against the cwd first (explicit user
    intent), then anchored at the repo root (so the default
    ``artifacts/bi_encoder`` works from ANY working directory).  If
    the path is configured but no directory exists, warn LOUDLY and
    return None — a silent from-scratch run must never masquerade as
    a warm-started one (review finding r3)."""
    if not path:
        return None
    candidates = [path]
    if not os.path.isabs(path):
        repo_root = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
        candidates.append(os.path.join(repo_root, path))
    for cand in candidates:
        if os.path.isdir(cand):
            return os.path.abspath(cand)
    logger.warning(
        "init_from=%r configured but no such directory (tried %s): "
        "training FROM SCRATCH — expect drastically worse rerank "
        "quality than a warm-started run",
        path,
        candidates,
    )
    return None


@dataclass
class RerankEvalConfig:
    n_episodes: int = 48
    chunks_per_episode: int = 8
    holdout_frac: float = 0.25
    steps: int = 600
    batch: int = 16  # in-batch group size Q (Q^2 pair forwards/step)
    lr: float = 3e-4
    dim: int = 128
    layers: int = 2
    heads: int = 4
    n_experts: int = 4  # must match the warm-start tower when used
    max_len: int = 224  # fits full query+doc; segment pos stay < 128
    candidates: int = 32  # rerank candidate-set size per eval query
    queries_per_chunk: int = 2
    seed: int = 0
    # Warm-start the tower from the shipped bi-encoder (same
    # architecture): the interaction head then inherits the trained
    # two-tower ranking quality at step 0 and fine-tuning adds the
    # cross-attention advantage — the standard init-cross-encoders-
    # from-dual-encoders recipe.  None = train from scratch (a tiny
    # byte transformer needs far more steps that way; a from-scratch
    # CPU run was flat at ln(Q) after 1500 steps — PERFORMANCE.md r3).
    init_from: Optional[str] = "artifacts/bi_encoder"
    # Distillation as an auxiliary REGULARIZER on the relevance
    # fine-tune (the round-4 finding: pure distillation never beats
    # the warm start, but its fidelity-matching objective generalizes
    # better held-out than the pure relevance objective — so combine
    # them): loss = listwise CE + distill_weight * MSE(sigmoid(logit),
    # |<psi_q|psi_d>|^2) over the SAME in-batch pair matrix, teacher =
    # analytic fidelity over the warm-start bi-encoder's embeddings
    # (models/distill.py semantics).  0 = off (the round-3 recipe).
    distill_weight: float = 0.0
    distill_qubits: int = 10
    # Record a rerank-quality-vs-steps curve (VERDICT r3 item 9):
    # every `curve_every` steps evaluate the current scorer on a fixed
    # subsample of validation AND held-out cases.  The curve is
    # EVIDENCE (where does quality plateau); ship decisions still use
    # the final VAL slice only.  0 = off.
    curve_every: int = 0
    curve_cases: int = 96
    # FRESH-CORPUS validation fold (VERDICT r4 #6): generate
    # round(val_episode_frac * n_episodes) EXTRA episodes under a
    # different seed and run the ship rule on queries targeting those
    # — chunks neither the fine-tune NOR the warm-start bi-encoder's
    # own pretraining ever saw.  The round-3/4 protocol validated on
    # train-chunk queries the model had memorized (VAL nDCG 0.987 vs
    # held-out 0.431 — the slice could not rank variants by
    # generalization); a first fix that carved val episodes out of
    # the TRAIN split measured 0.96 — still memorized, because the
    # warm-start tower was pretrained on those very episodes in an
    # earlier round.  Only a fresh-seed corpus is unseen by BOTH
    # stages.  The held-out split stays untouched (no peeking), and
    # the trainer keeps the full train split (no data loss).
    # 0 = the old memorized-slice protocol.
    val_episode_frac: float = 0.25
    # Fine-tune data scaling with a FIXED eval protocol: append this
    # many fresh-seed episodes (seed+201) to the fine-tune pool ONLY.
    # Eval cases and candidate pools stay on the base corpus, so
    # held-out numbers remain comparable across data scales (the r4
    # plateau finding says more steps buy nothing at 48 episodes —
    # this is the more-data lever for the same benchmark).
    extra_train_episodes: int = 0


def _make_cfg(cfg: RerankEvalConfig):
    import jax
    import jax.numpy as jnp

    from qrag_tpu.models.cross_encoder import CrossEncoderConfig

    return CrossEncoderConfig(
        dim=cfg.dim,
        n_heads=cfg.heads,
        n_layers=cfg.layers,
        max_len=cfg.max_len,
        n_experts=cfg.n_experts,
        dtype=jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32,
        head_type="interaction",
    )


def warm_start_params(ce_cfg, weights_dir: str):
    """Map trained bi-encoder weights onto the cross-encoder tree:
    tower (tok/pos embeddings, blocks, final LN) verbatim, the
    bi-encoder's projection becomes the interaction head's ``iproj``,
    and the CLS head starts at zero so step-0 scores are purely the
    inherited similarity."""
    import jax
    import jax.numpy as jnp

    from qrag_tpu.models.bi_encoder import TrainedEmbedder
    from qrag_tpu.models.cross_encoder import init_params

    bi = TrainedEmbedder(weights_dir=weights_dir)
    t = bi.cfg.tower
    if (t.dim, t.n_heads, t.n_layers, t.n_experts) != (
        ce_cfg.dim, ce_cfg.n_heads, ce_cfg.n_layers, ce_cfg.n_experts
    ):
        raise ValueError(
            f"warm-start tower mismatch: artifact {t} vs requested {ce_cfg}"
        )
    if bi.cfg.out_dim != ce_cfg.dim:
        raise ValueError(
            "interaction iproj needs out_dim == dim to inherit proj "
            f"(artifact out_dim={bi.cfg.out_dim}, dim={ce_cfg.dim})"
        )
    params = init_params(jax.random.PRNGKey(0), ce_cfg)
    for key in ("tok_emb", "pos_emb", "final_ln"):
        params[key] = bi.params[key]
    # tower blocks verbatim; keep the fresh xgate (zeros = closed)
    new_layers = []
    for fresh, tower in zip(params["layers"], bi.params["layers"]):
        merged = dict(tower)
        merged["xgate"] = fresh["xgate"]
        new_layers.append(merged)
    params["layers"] = new_layers
    params["iproj"] = bi.params["proj"]
    params["head"] = jax.tree_util.tree_map(
        jnp.zeros_like, params["head"]
    )
    return params


def train_cross_encoder(
    cfg: RerankEvalConfig,
    chunks: List[Chunk],
    train_idx: Sequence[int],
    hook=None,
):
    """In-batch listwise training: each step scores every (query_i,
    doc_j) pair of a Q-group (Q^2 forwards) with softmax-CE on the
    diagonal — the cross-encoder analogue of the bi-encoder's InfoNCE
    (a pointwise-BCE/fresh-pairs recipe was flat at this scale).
    With ``cfg.distill_weight > 0`` the fidelity teacher's scores over
    the same pair matrix are matched as an auxiliary MSE (see
    RerankEvalConfig).  ``hook(step, scorer)`` fires every
    ``cfg.curve_every`` steps when given.
    Returns (CrossEncoderScorer, loss trace)."""
    import functools
    import os

    import jax
    import jax.numpy as jnp
    import optax

    from qrag_tpu.models.cross_encoder import (
        CrossEncoderScorer,
        forward,
        init_params,
        tokenize_pair,
    )

    ce_cfg = _make_cfg(cfg)
    init_dir = resolve_init_from(cfg.init_from)
    if init_dir:
        params = warm_start_params(ce_cfg, init_dir)
    else:
        params = init_params(jax.random.PRNGKey(cfg.seed), ce_cfg)
    optimizer = optax.adamw(cfg.lr, weight_decay=1e-4)
    opt_state = optimizer.init(params)

    distill_w = float(cfg.distill_weight)
    teacher_fn = None
    if distill_w > 0.0:
        if not init_dir:
            raise ValueError(
                "distill_weight > 0 needs init_from (the teacher is "
                "fidelity over the warm-start bi-encoder's embeddings)"
            )
        from qrag_tpu.models.bi_encoder import TrainedEmbedder
        from qrag_tpu.ops.statevector import batched_fidelity

        t_emb = TrainedEmbedder(weights_dir=init_dir)
        # chunk texts are fixed: embed the whole corpus once
        all_doc_vecs = np.asarray(
            t_emb([c.text for c in chunks]), np.float32
        )

        @jax.jit
        def _fid(qv, dv):
            return jax.vmap(
                lambda q: batched_fidelity(
                    q, dv, n_qubits=cfg.distill_qubits, analytic=True
                )
            )(qv)

        def teacher_fn(qs: List[str], cis: List[int]) -> np.ndarray:
            qv = jnp.asarray(np.asarray(t_emb(qs), np.float32))
            dv = jnp.asarray(all_doc_vecs[np.asarray(cis)])
            return np.asarray(_fid(qv, dv), np.float32)  # (Q, Q)

    def inbatch_loss(p, tokens, mask, teacher):
        qn, m, tl = tokens.shape
        logits = forward(
            p, tokens.reshape(qn * m, tl), mask.reshape(qn * m, tl), ce_cfg
        ).reshape(qn, m)
        lab = jnp.arange(qn)
        loss = -jnp.mean(jax.nn.log_softmax(logits, axis=1)[lab, lab])
        if distill_w > 0.0:
            loss = loss + distill_w * jnp.mean(
                (jax.nn.sigmoid(logits) - teacher) ** 2
            )
        return loss

    @jax.jit
    def step(p, st, tokens, mask, teacher):
        loss, g = jax.value_and_grad(inbatch_loss)(p, tokens, mask, teacher)
        up, st = optimizer.update(g, st, p)
        return jax.tree_util.tree_map(lambda a, u: a + u, p, up), st, loss

    rng = np.random.RandomState(cfg.seed + 3)
    ids = np.asarray(list(train_idx))
    by_topic: Dict[str, List[int]] = {}
    for i in train_idx:
        by_topic.setdefault(chunks[i].topic, []).append(i)
    topics = [t for t, members in by_topic.items() if len(members) >= 2]
    q_n = min(cfg.batch, len(ids))
    losses: List[Tuple[int, float]] = []
    for it in range(cfg.steps):
        if topics and it % 2 == 0:
            # HARD group: all chunks share one topic, so in-batch
            # negatives differ only by their rare tokens — the case
            # where the warm-started model's loss is NOT already ~0
            # and the cross-attention gates have something to learn
            # (random groups start at loss ~0.005: nothing to learn)
            topic = topics[rng.randint(len(topics))]
            pool = by_topic[topic]
            size = min(q_n, len(pool))
            picks = rng.choice(len(pool), size=size, replace=False)
            cis = [int(pool[p_]) for p_ in picks]
            if size < q_n:  # top up (keeps one compiled shape)
                extra = [i for i in ids if i not in set(cis)]
                cis += [
                    int(x)
                    for x in rng.choice(extra, size=q_n - size, replace=False)
                ]
        else:
            # mixed group: keeps cross-topic separation from drifting
            picks = rng.choice(len(ids), size=q_n, replace=False)
            cis = [int(ids[p_]) for p_ in picks]
        qs = [make_query(chunks[c], rng) for c in cis]
        toks = np.zeros((q_n, q_n, cfg.max_len), np.int32)
        masks = np.zeros((q_n, q_n, cfg.max_len), np.float32)
        for i in range(q_n):
            for j in range(q_n):
                t, m = tokenize_pair(qs[i], chunks[cis[j]].text, cfg.max_len)
                toks[i, j] = t
                masks[i, j] = m
        teacher = (
            jnp.asarray(teacher_fn(qs, cis))
            if teacher_fn is not None
            else jnp.zeros((q_n, q_n), jnp.float32)
        )
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(toks), jnp.asarray(masks), teacher
        )
        if it % 50 == 0 or it == cfg.steps - 1:
            losses.append((it, float(loss)))
        if (
            hook is not None
            and cfg.curve_every
            and (it + 1) % cfg.curve_every == 0
        ):
            hook(it + 1, CrossEncoderScorer(ce_cfg, params=params))
    return CrossEncoderScorer(ce_cfg, params=params), losses


# ------------------------------------------------------------------ scoring


def _cosine_scorer(embedder):
    """The ClassicalReranker's cosine scoring exactly
    (``reranker/classical.py:89-93``)."""
    import jax.numpy as jnp

    from qrag_tpu.ops.topk import cosine_scores

    def score(query: str, docs: List[str]) -> np.ndarray:
        embeds = embedder([query] + list(docs))
        q, d = embeds[:1], embeds[1:]
        return np.asarray(cosine_scores(jnp.asarray(q), jnp.asarray(d)))[0]

    return score


def _eval_cases(
    cfg: RerankEvalConfig,
    chunks: List[Chunk],
    hold_idx: Sequence[int],
    seed: int = 17,
) -> List[Tuple[str, List[int], int]]:
    """(query, candidate chunk ids, position of the true chunk)."""
    rng = np.random.RandomState(seed)
    all_ids = np.arange(len(chunks))
    by_topic: Dict[str, List[int]] = {}
    for i, c in enumerate(chunks):
        by_topic.setdefault(c.topic, []).append(i)
    cases = []
    for ci in hold_idx:
        for _ in range(cfg.queries_per_chunk):
            q = make_query(chunks[ci], rng)
            same = [j for j in by_topic[chunks[ci].topic] if j != ci]
            n_hard = min(len(same), (cfg.candidates - 1) // 2)
            hard = list(rng.choice(same, size=n_hard, replace=False))
            pool = [j for j in all_ids if j != ci and j not in set(hard)]
            rand = list(
                rng.choice(pool, size=cfg.candidates - 1 - n_hard, replace=False)
            )
            cand = [ci] + hard + rand
            order = rng.permutation(len(cand))
            cand = [cand[o] for o in order]
            cases.append((q, cand, cand.index(ci)))
    return cases


def eval_ranker(
    score_fn,
    chunks: List[Chunk],
    cases: List[Tuple[str, List[int], int]],
) -> Dict[str, float]:
    """top-1 / MRR / nDCG@10 of a (query, docs)->scores ranker over
    the candidate sets (single relevant doc per case)."""
    top1 = mrr = ndcg = 0.0
    for q, cand, true_pos in cases:
        scores = np.asarray(score_fn(q, [chunks[j].text for j in cand]))
        # descending scores; ties break to the earlier candidate
        order = np.argsort(-scores, kind="stable")
        rank = int(np.where(order == true_pos)[0][0]) + 1  # 1-based
        top1 += rank == 1
        mrr += 1.0 / rank
        ndcg += 1.0 / math.log2(rank + 1) if rank <= 10 else 0.0
    n = len(cases)
    return {
        "top1": round(top1 / n, 4),
        "mrr": round(mrr / n, 4),
        "ndcg@10": round(ndcg / n, 4),
    }


def run_eval(
    cfg: Optional[RerankEvalConfig] = None,
    weights_dir: Optional[str] = None,
) -> Dict[str, object]:
    from qrag_tpu.models.cross_encoder import CrossEncoderScorer
    from qrag_tpu.pipeline.embeddings import HashEmbedder

    cfg = cfg or RerankEvalConfig()
    chunks = generate_corpus(
        cfg.n_episodes, cfg.chunks_per_episode, seed=cfg.seed
    )
    train_idx, hold_idx = split_by_episode(
        chunks, cfg.holdout_frac, seed=cfg.seed + 1
    )
    fit_idx = list(train_idx)
    if cfg.val_episode_frac > 0:
        # FRESH-SEED validation corpus: episodes neither training
        # stage ever saw (see the config-field comment).  Its cases
        # draw candidates from its own pool, exactly like held-out.
        n_val_eps = max(1, int(round(cfg.val_episode_frac * cfg.n_episodes)))
        val_chunks = generate_corpus(
            n_val_eps, cfg.chunks_per_episode, seed=cfg.seed + 101
        )
        val_idx = list(range(len(val_chunks)))
    else:
        val_chunks = chunks
        val_idx = list(train_idx)[: len(hold_idx)]
    curve: List[Dict[str, object]] = []
    hook = None
    if cfg.curve_every:
        # fixed subsampled case sets so every curve point is comparable
        curve_val = _eval_cases(
            cfg, val_chunks, val_idx[: max(len(hold_idx), 1)], seed=29
        )[: cfg.curve_cases]
        curve_hold = _eval_cases(cfg, chunks, hold_idx)[: cfg.curve_cases]

        def hook(at_step, cur_scorer):
            curve.append(
                {
                    "step": at_step,
                    "val": eval_ranker(
                        cur_scorer.score, val_chunks, curve_val
                    ),
                    "holdout": eval_ranker(
                        cur_scorer.score, chunks, curve_hold
                    ),
                }
            )
            logger.info("curve @%d: %s", at_step, curve[-1])

    train_pool = chunks
    if cfg.extra_train_episodes > 0:
        # extra fine-tune episodes live OUTSIDE the eval corpus: they
        # extend the training pool but never enter candidate pools
        extra_chunks = generate_corpus(
            cfg.extra_train_episodes, cfg.chunks_per_episode,
            seed=cfg.seed + 201,
        )
        train_pool = chunks + extra_chunks
        fit_idx = list(fit_idx) + list(
            range(len(chunks), len(train_pool))
        )
    t0 = time.time()
    scorer, losses = train_cross_encoder(cfg, train_pool, fit_idx, hook=hook)
    train_s = time.time() - t0
    cases = _eval_cases(cfg, chunks, hold_idx)

    picked = "fine-tuned"
    init_dir = resolve_init_from(cfg.init_from)
    warm = None
    if init_dir:
        # ship whichever of {step-0 warm start, fine-tuned} validates
        # better on the validation fold (val_episode_frac > 0: train
        # episodes the trainer never fit — a GENERALIZATION fold; no
        # peeking at the held-out episodes either way): fine-tuning
        # can then never regress the shipped scorer below the
        # inherited bi-encoder quality
        warm = CrossEncoderScorer(
            _make_cfg(cfg),
            params=warm_start_params(_make_cfg(cfg), init_dir),
        )
        val_cases = _eval_cases(
            cfg, val_chunks, val_idx[: max(len(hold_idx), 1)], seed=29
        )
        val_ft = eval_ranker(scorer.score, val_chunks, val_cases)
        val_w = eval_ranker(warm.score, val_chunks, val_cases)
        if val_w["ndcg@10"] > val_ft["ndcg@10"]:
            scorer, picked = warm, "warm-start (fine-tune regressed val)"

    out: Dict[str, object] = {
        "corpus_chunks": len(chunks),
        "held_out_chunks": len(hold_idx),
        "fit_chunks": len(fit_idx),
        "val_fold_chunks": (
            len(val_idx) if cfg.val_episode_frac > 0 else 0
        ),
        "val_protocol": (
            "fresh-corpus" if cfg.val_episode_frac > 0
            else "train-slice (legacy)"
        ),
        "eval_cases": len(cases),
        "candidates_per_case": cfg.candidates,
        "steps": cfg.steps,
        "train_seconds": round(train_s, 1),
        "loss_trace": losses,
    }
    if cfg.distill_weight:
        out["distill_weight"] = cfg.distill_weight
    if curve:
        out["quality_curve"] = curve
    # record the warm-start disposition EXPLICITLY: a missing artifact
    # must be visible in the output, not just a log line
    if cfg.init_from:
        out["warm_start"] = init_dir if init_dir else "MISSING (from scratch)"
    if init_dir:
        out["shipped_variant"] = picked
        out["val_finetuned"] = val_ft
        out["val_warmstart"] = val_w
    out["cross_encoder_trained"] = eval_ranker(scorer.score, chunks, cases)
    # the production fallback baseline: HashEmbedder(256) cosine
    # (reranker/classical.py:76) — "embedding cosine"
    out["cosine_hash"] = eval_ranker(
        _cosine_scorer(HashEmbedder(dim=256)), chunks, cases
    )
    # untrained floor: random-init cross-encoder
    untrained = CrossEncoderScorer(_make_cfg(cfg), seed=cfg.seed + 9)
    out["cross_encoder_untrained"] = eval_ranker(
        untrained.score, chunks, cases
    )
    if init_dir:
        from qrag_tpu.models.bi_encoder import TrainedEmbedder

        # the STRONG cosine baseline the fine-tuned model must beat:
        # the shipped trained bi-encoder's cosine
        bi = TrainedEmbedder(weights_dir=init_dir)
        out["cosine_trained_bi_encoder"] = eval_ranker(
            _cosine_scorer(bi), chunks, cases
        )
        # step-0 warm-start quality (inherited similarity, no
        # fine-tuning): shows what fine-tuning adds on top — the SAME
        # scorer instance built for the validation pick above
        out["cross_encoder_warmstart_step0"] = eval_ranker(
            warm.score, chunks, cases
        )

    if weights_dir:
        scorer.save(weights_dir)
        out["weights_dir"] = weights_dir
    return out


def main(argv=None) -> None:
    import argparse

    p = argparse.ArgumentParser(
        description="train + rerank-quality eval (cross-encoder vs cosine)"
    )
    p.add_argument("--steps", type=int, default=600)
    p.add_argument("--episodes", type=int, default=48)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--weights-dir", default=None)
    p.add_argument(
        "--distill-weight", type=float, default=0.0,
        help="auxiliary fidelity-distillation MSE weight (0 = off)",
    )
    p.add_argument(
        "--curve-every", type=int, default=0,
        help="record val+holdout quality every N steps (0 = off)",
    )
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--val-episode-frac", type=float, default=0.25,
        help="fresh-seed validation corpus size as a fraction of "
        "n_episodes (the ship-rule fold; 0 = the legacy "
        "memorized-train-slice protocol)",
    )
    p.add_argument(
        "--extra-train-episodes", type=int, default=0,
        help="fresh-seed episodes appended to the fine-tune pool only "
        "(eval protocol unchanged)",
    )
    p.add_argument(
        "--init-from", default="artifacts/bi_encoder",
        help="bi-encoder artifact for the warm start ('' = from scratch)",
    )
    args = p.parse_args(argv)
    cfg = RerankEvalConfig(
        steps=args.steps,
        n_episodes=args.episodes,
        batch=args.batch,
        distill_weight=args.distill_weight,
        curve_every=args.curve_every,
        lr=args.lr,
        seed=args.seed,
        val_episode_frac=args.val_episode_frac,
        extra_train_episodes=args.extra_train_episodes,
        init_from=args.init_from or None,
    )
    print(json.dumps(run_eval(cfg, weights_dir=args.weights_dir), indent=2))


if __name__ == "__main__":
    main()
