"""Numpy kernels for GloVe/PGloVe + AdaGrad/Adam/AMSGrad shard training.

Exact reference math, vectorized:
  * GloVe   inner = focus·context + b_f + b_c - log(Xij); weight =
    (Xij/max)^0.75, or 1 when Xij > max (opt/GloveCost.java:7-20).
  * PGloVe  inner = focus·context + b_f + b_c - logit(Xij); weight = Xij
    (opt/PGloveCost.java:7-21).
  * loss per entry = 0.5 * weight * inner^2 (opt/grad/Adagrad.java:60).
  * AdaGrad: param -= lr * grad / sqrt(G); G += grad^2; the BIAS update
    deliberately omits lr (Adagrad.java:88-89 — matches original GloVe C).
  * Adam: correction = lr*sqrt(1-beta2^(t+1))/(1-beta1^(t+1)) (Adam.java:84);
    beta1=0.9 beta2=0.999 eps=1e-7 (Adam.java:45-53).
  * AMSGrad: v = max(v_prev, beta2*v_prev + (1-beta2)*g^2), step without
    correction (AMSGrad.java:129-150).

The reference applies updates entry-by-entry (hogwild across threads,
Optimizer.java:77-94). Executors share no memory, so the shard kernel
processes its slice in mini-batches: gradients within a batch are computed
against the same snapshot, scattered with np.add.at (duplicate-safe), and
state advances between batches. batch=1 reproduces the sequential
reference order exactly (used by the unit tests); larger batches are the
throughput path and are tolerance-gated (SURVEY.md §7).

Parameter layout per node row (all float32):
  focus[dim], context[dim], f_bias, c_bias, state[...]
  state layouts: adagrad  -> [gsq_f(dim), gsq_c(dim), gsq_fb, gsq_cb]  (init 1.0)
                 adam     -> [m_f, v_f, m_c, v_c](dim each), m_fb, v_fb, m_cb, v_cb (init 0)
                 amsgrad  -> same as adam
"""

from __future__ import annotations

import numpy as np

LEARNING_RATE = np.float32(0.05)  # Optimizer.java:26
BETA1, BETA2 = 0.9, 0.999  # Adam.java:45-47
ADAM_EPS = 1e-7  # Adam.java:53


def state_size(method: str, dim: int) -> int:
    if method == "adagrad":
        return 2 * dim + 2
    if method in ("adam", "amsgrad"):
        return 4 * dim + 4
    raise ValueError(f"unknown optimizer {method}")


def init_state(method: str, dim: int, n: int) -> np.ndarray:
    if method == "adagrad":
        return np.ones((n, state_size(method, dim)), dtype=np.float32)  # Adagrad.java:28-33
    return np.zeros((n, state_size(method, dim)), dtype=np.float32)  # Adam.java:55-66


# ---------------------------------------------------------------------------
# Deterministic parameter init — replaces the reference's wall-clock-seeded
# U(-0.5, 0.5)/dim (Optimizer.java:50-57, Configuration.java:157-159) with a
# counter-based splitmix64 keyed on (seed, node_id, slot): identical at any
# parallelism / cluster size, which is what makes runs resumable+comparable.
# ---------------------------------------------------------------------------

def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    z = x
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    return z ^ (z >> np.uint64(31))


def init_params(node_ids: np.ndarray, dim: int, seed: int) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """-> (focus[n,dim], context[n,dim], f_bias[n], c_bias[n]) in
    U(-0.5,0.5)/dim as float32, a pure function of (seed, node_id)."""
    n = len(node_ids)
    ids = node_ids.astype(np.uint64)
    slots = 2 * dim + 2

    base = _splitmix64(ids * np.uint64(0x100000001B3) ^ np.uint64(seed))
    counters = (
        base[:, None] + np.arange(slots, dtype=np.uint64)[None, :] * np.uint64(0x9E3779B97F4A7C15)
    ) & np.uint64(0xFFFFFFFFFFFFFFFF)
    u = (_splitmix64(counters) >> np.uint64(11)).astype(np.float64) / float(1 << 53)  # [0,1)
    vals = ((u - 0.5) / dim).astype(np.float32)
    focus = vals[:, :dim]
    context = vals[:, dim : 2 * dim]
    f_bias = vals[:, 2 * dim]
    c_bias = vals[:, 2 * dim + 1]
    return np.ascontiguousarray(focus), np.ascontiguousarray(context), f_bias.copy(), c_bias.copy()


# ---------------------------------------------------------------------------
# Cost functions
# ---------------------------------------------------------------------------

def inner_and_weight(method: str, x: np.ndarray, dots: np.ndarray, bf: np.ndarray, bc: np.ndarray, max_x: float):
    """(inner, weight) per entry; float64 accumulation like the reference's
    double paint/cost accumulators."""
    if method == "glove":
        inner = dots + bf + bc - np.log(x)
        w = np.where(x > max_x, 1.0, np.power(x / max_x, 0.75))
    elif method == "pglove":
        # logit link: defined only for probabilities. BCA unity
        # normalization produces (0,1) by construction (A5); raw counts
        # here would silently train NaN/inf into every touched row
        if x.size and (np.min(x) <= 0.0 or np.max(x) >= 1.0):
            raise ValueError(
                "pglove cost needs x in (0,1) — BCA probabilities "
                "(normalize='unity'), not raw co-occurrence counts"
            )
        inner = dots + bf + bc - np.log(x / (1.0 - x))
        w = x
    else:
        raise ValueError(f"unknown cost {method}")
    return inner, w


def _segments(idx: np.ndarray):
    """Duplicate structure of one batch's index vector, computed ONCE and
    shared by the matrix and bias updates that scatter into the same ids
    (previously each _adagrad_apply re-sorted — 4 argsorts per batch).

    Returns (order, si, seg_start, start_of, uniq): stable sort order, the
    sorted ids, each segment's start offset, each element's segment-start
    offset, and the unique ids (one per segment)."""
    order = np.argsort(idx, kind="stable")
    si = idx[order]
    seg_start = np.r_[0, np.flatnonzero(si[1:] != si[:-1]) + 1]
    lens = np.diff(np.r_[seg_start, len(si)])
    start_of = np.repeat(seg_start, lens)
    return order, si, seg_start, start_of, si[seg_start]


def _adagrad_apply(param: np.ndarray, gsq: np.ndarray, seg, grad: np.ndarray, lr: float):
    """param[idx] -= lr * grad / sqrt(gsq + within-batch prefix); gsq += grad².

    The within-batch prefix reproduces sequential AdaGrad's property that
    each occurrence of the same parameter divides by a gradient-square sum
    already grown by its predecessors — without it, a hub node appearing k
    times in one batch takes k full-size steps and the pass diverges (the
    bias step has no lr, Adagrad.java:88-89, so this matters most there).

    Scatter is reduceat-per-segment + one fancy-indexed add on the UNIQUE
    ids — np.add.at's unbuffered element loop was 43% of kernel time
    (profiled at 100k entries). Identical math; float addition order within
    a segment differs only for duplicate ids in one batch (exact at
    batch=1, the order the exactness tests pin)."""
    order, si, seg_start, start_of, uniq = seg
    g2 = (grad * grad)[order]
    csum = np.cumsum(g2, axis=0)
    prefix = (csum - g2) - (csum[start_of] - g2[start_of])
    denom = np.sqrt(gsq[si] + prefix)
    param[uniq] += np.add.reduceat(-lr * grad[order] / denom, seg_start, axis=0)
    gsq[uniq] += np.add.reduceat(g2, seg_start, axis=0)


def half_state_size(method: str, dim: int) -> int:
    """Width of ONE side's optimizer-state slice: [gsq(dim), gsq_bias] for
    AdaGrad, [m(dim), v(dim), m_bias, v_bias] for Adam/AMSGrad. The focus
    half and the context half of `state` (layouts in the module docstring)
    each have this width; train_epoch ships only the relevant half to a
    grid shard."""
    return state_size(method, dim) // 2


def train_shard(
    iu: np.ndarray,
    jv: np.ndarray,
    x: np.ndarray,
    focus: np.ndarray,
    context: np.ndarray,
    f_bias: np.ndarray,
    c_bias: np.ndarray,
    state: np.ndarray | None,
    method: str,
    cost: str,
    max_x: float,
    iteration: int,
    batch: int = 4096,
    state_f: np.ndarray | None = None,
    state_c: np.ndarray | None = None,
) -> float:
    """Run one epoch's pass over a shard IN PLACE; returns the summed
    0.5*w*inner^2 cost. iu/jv index into the local param arrays.

    Two state layouts: `state` (combined — focus/context/bias share one
    node axis; the exactness tests and single-axis callers use this) or
    `state_f`+`state_c` (per-side halves of half_state_size width, with
    independent node axes: iu indexes the focus-side arrays, jv the
    context-side ones — the side-split grid shards use this)."""
    dim = focus.shape[1]
    lr = LEARNING_RATE
    total_cost = 0.0

    if state is None:
        if method == "adagrad":
            gsq_f, gsq_fb = state_f[:, :dim], state_f[:, dim]
            gsq_c, gsq_cb = state_c[:, :dim], state_c[:, dim]
        else:
            m_f, v_f = state_f[:, :dim], state_f[:, dim : 2 * dim]
            m_fb, v_fb = state_f[:, 2 * dim], state_f[:, 2 * dim + 1]
            m_c, v_c = state_c[:, :dim], state_c[:, dim : 2 * dim]
            m_cb, v_cb = state_c[:, 2 * dim], state_c[:, 2 * dim + 1]
    elif method == "adagrad":
        gsq_f, gsq_c = state[:, :dim], state[:, dim : 2 * dim]
        gsq_fb, gsq_cb = state[:, 2 * dim], state[:, 2 * dim + 1]
    else:
        m_f, v_f = state[:, :dim], state[:, dim : 2 * dim]
        m_c, v_c = state[:, 2 * dim : 3 * dim], state[:, 3 * dim : 4 * dim]
        m_fb, v_fb = state[:, 4 * dim], state[:, 4 * dim + 1]
        m_cb, v_cb = state[:, 4 * dim + 2], state[:, 4 * dim + 3]
    if method != "adagrad":
        correction = lr * np.sqrt(1.0 - BETA2 ** (iteration + 1)) / (1.0 - BETA1 ** (iteration + 1))

    for s in range(0, len(x), batch):
        u = iu[s : s + batch]
        v = jv[s : s + batch]
        xb = x[s : s + batch].astype(np.float64)

        fu = focus[u]  # [b, dim] gather (copy = batch snapshot)
        cv = context[v]
        dots = np.einsum("bd,bd->b", fu.astype(np.float64), cv.astype(np.float64))
        inner, w = inner_and_weight(cost, xb, dots, f_bias[u].astype(np.float64), c_bias[v].astype(np.float64), max_x)
        wc = (w * inner).astype(np.float32)  # weightedCost
        total_cost += float(np.sum(0.5 * w * inner * inner))

        grad_f = wc[:, None] * cv  # d cost / d focus  (Adagrad.java:78)
        grad_c = wc[:, None] * fu

        if method == "adagrad":
            # each occurrence divides by G grown by its in-batch predecessors
            # (sequential semantics, Adagrad.java:80-85; exact at batch=1)
            seg_u, seg_v = _segments(u), _segments(v)
            _adagrad_apply(focus, gsq_f, seg_u, grad_f, lr)
            _adagrad_apply(context, gsq_c, seg_v, grad_c, lr)
            # bias step WITHOUT lr (Adagrad.java:88-89)
            _adagrad_apply(f_bias, gsq_fb, seg_u, wc, 1.0)
            _adagrad_apply(c_bias, gsq_cb, seg_v, wc, 1.0)
        else:
            m1f = BETA1 * m_f[u] + (1 - BETA1) * grad_f
            m1c = BETA1 * m_c[v] + (1 - BETA1) * grad_c
            if method == "adam":
                v1f = BETA2 * v_f[u] + (1 - BETA2) * grad_f * grad_f
                v1c = BETA2 * v_c[v] + (1 - BETA2) * grad_c * grad_c
                step = correction
            else:  # amsgrad: max-of-moments, raw lr (AMSGrad.java:129-135)
                v1f = np.maximum(v_f[u], BETA2 * v_f[u] + (1 - BETA2) * grad_f * grad_f)
                v1c = np.maximum(v_c[v], BETA2 * v_c[v] + (1 - BETA2) * grad_c * grad_c)
                step = lr
            np.add.at(focus, u, -step * m1f / (np.sqrt(v1f) + ADAM_EPS))
            np.add.at(context, v, -step * m1c / (np.sqrt(v1c) + ADAM_EPS))
            # scatter-store moments: last write wins on duplicates (batch>1 is
            # an approximation; batch=1 is exact)
            m_f[u], v_f[u] = m1f, v1f
            m_c[v], v_c[v] = m1c, v1c

            m1fb = BETA1 * m_fb[u] + (1 - BETA1) * wc
            m1cb = BETA1 * m_cb[v] + (1 - BETA1) * wc
            if method == "adam":
                v1fb = BETA2 * v_fb[u] + (1 - BETA2) * wc * wc
                v1cb = BETA2 * v_cb[v] + (1 - BETA2) * wc * wc
            else:
                v1fb = np.maximum(v_fb[u], BETA2 * v_fb[u] + (1 - BETA2) * wc * wc)
                v1cb = np.maximum(v_cb[v], BETA2 * v_cb[v] + (1 - BETA2) * wc * wc)
            np.add.at(f_bias, u, -step * m1fb / (np.sqrt(v1fb) + ADAM_EPS))
            np.add.at(c_bias, v, -step * m1cb / (np.sqrt(v1cb) + ADAM_EPS))
            m_fb[u], v_fb[u] = m1fb, v1fb
            m_cb[v], v_cb[v] = m1cb, v1cb

    return total_cost
