"""GloVe training: kernel math vs hand-computed reference updates, cost
decrease, deterministic init, averaging semantics."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from graph_embeddings_spark.glove.kernel import (
    init_params,
    init_state,
    inner_and_weight,
    train_shard,
)
from graph_embeddings_spark.glove.train import (
    extract_embeddings,
    init_params_df,
    optimize,
    train_epoch,
)


# ---------------------------------------------------------------------------
# Kernel math (reference-exact at batch=1)
# ---------------------------------------------------------------------------

def test_glove_cost_values():
    """GloveCost.java:7-20: inner = dot + bf + bc - log(X); w = (X/max)^.75
    capped to 1 above max."""
    dots = np.array([0.5])
    inner, w = inner_and_weight("glove", np.array([2.0]), dots, np.array([0.1]), np.array([0.2]), max_x=8.0)
    assert inner[0] == pytest.approx(0.5 + 0.1 + 0.2 - math.log(2.0))
    assert w[0] == pytest.approx((2.0 / 8.0) ** 0.75)
    _, w2 = inner_and_weight("glove", np.array([10.0]), dots, np.array([0.0]), np.array([0.0]), max_x=8.0)
    assert w2[0] == 1.0


def test_pglove_cost_values():
    """PGloveCost.java:7-21: logit link, weight = Xij."""
    inner, w = inner_and_weight("pglove", np.array([0.25]), np.array([0.0]), np.array([0.0]), np.array([0.0]), max_x=1.0)
    assert inner[0] == pytest.approx(-math.log(0.25 / 0.75))
    assert w[0] == 0.25


def test_adagrad_single_step_hand_computed():
    """One entry, one step, G init = 1 (Adagrad.java:28-33): update is
    param -= lr * grad (vectors) and bias -= weightedCost WITHOUT lr
    (Adagrad.java:88-89)."""
    dim = 2
    focus = np.array([[0.1, 0.2]], dtype=np.float32)
    context = np.array([[0.3, -0.1]], dtype=np.float32)
    fb = np.array([0.05], dtype=np.float32)
    cb = np.array([-0.02], dtype=np.float32)
    state = init_state("adagrad", dim, 1)
    x = 2.0
    max_x = 4.0

    dot = 0.1 * 0.3 + 0.2 * -0.1
    inner = dot + 0.05 - 0.02 - math.log(x)
    w = (x / max_x) ** 0.75
    wc = w * inner
    exp_focus = np.array([0.1, 0.2]) - 0.05 * wc * np.array([0.3, -0.1])
    exp_context = np.array([0.3, -0.1]) - 0.05 * wc * np.array([0.1, 0.2])
    exp_fb = 0.05 - wc  # NO learning rate on the bias step
    exp_cb = -0.02 - wc

    cost = train_shard(
        np.array([0]), np.array([0]), np.array([x]),
        focus, context, fb, cb, state,
        method="adagrad", cost="glove", max_x=max_x, iteration=0, batch=1,
    )
    assert cost == pytest.approx(0.5 * w * inner * inner, rel=1e-5)
    assert focus[0] == pytest.approx(exp_focus, rel=1e-5)
    assert context[0] == pytest.approx(exp_context, rel=1e-5)
    assert fb[0] == pytest.approx(exp_fb, rel=1e-5)
    assert cb[0] == pytest.approx(exp_cb, rel=1e-5)
    # squared grads accumulated: G = 1 + grad^2
    assert state[0, 0] == pytest.approx(1 + (wc * 0.3) ** 2, rel=1e-5)
    assert state[0, 2 * dim] == pytest.approx(1 + wc * wc, rel=1e-5)


def test_adam_single_step_hand_computed():
    """Adam.java:84,113-124: correction-folded step, beta1=.9 beta2=.999."""
    dim = 1
    focus = np.array([[0.2]], dtype=np.float32)
    context = np.array([[0.4]], dtype=np.float32)
    fb = np.zeros(1, dtype=np.float32)
    cb = np.zeros(1, dtype=np.float32)
    state = init_state("adam", dim, 1)
    x, max_x = 1.0, 2.0
    inner = 0.2 * 0.4 - math.log(x)
    w = (x / max_x) ** 0.75
    wc = w * inner
    g = wc * 0.4  # focus grad
    m1 = 0.1 * g
    v1 = 0.001 * g * g
    corr = 0.05 * math.sqrt(1 - 0.999) / (1 - 0.9)
    exp_focus = 0.2 - corr * m1 / (math.sqrt(v1) + 1e-7)

    train_shard(
        np.array([0]), np.array([0]), np.array([x]),
        focus, context, fb, cb, state,
        method="adam", cost="glove", max_x=max_x, iteration=0, batch=1,
    )
    assert focus[0, 0] == pytest.approx(exp_focus, rel=1e-4)


def test_amsgrad_uses_max_moment():
    dim = 1
    focus = np.array([[0.2]], dtype=np.float32)
    context = np.array([[0.4]], dtype=np.float32)
    fb = np.zeros(1, dtype=np.float32)
    cb = np.zeros(1, dtype=np.float32)
    state = init_state("amsgrad", dim, 1)
    state[0, 1] = 100.0  # pre-existing huge v_f: max() must keep it
    train_shard(
        np.array([0]), np.array([0]), np.array([1.0]),
        focus, context, fb, cb, state,
        method="amsgrad", cost="glove", max_x=2.0, iteration=0, batch=1,
    )
    assert state[0, 1] == pytest.approx(100.0 * 0.999 + 0, abs=1.0) or state[0, 1] >= 99.0


def test_sequential_vs_batched_converge_alike():
    """batch=1 is reference-exact; larger batches take a different path but
    must converge to a comparable cost (metric-based acceptance per
    north_star — hogwild vs averaged SGD differ the same way). The fixture
    is adversarial: 200 entries over 20 nodes = every node duplicated ~10×
    per batch (the hub-skew case the segmented-prefix denominator handles)."""
    rng = np.random.default_rng(7)
    n, dim, entries = 20, 8, 200
    iu = rng.integers(0, n, entries)
    jv = rng.integers(0, n, entries)
    x = rng.uniform(0.5, 5.0, entries)

    def run(batch, epochs=8):
        focus, context, fb, cb = init_params(np.arange(n), dim, 42)
        state = init_state("adagrad", dim, n)
        c = 0.0
        for e in range(epochs):
            c = train_shard(iu.copy(), jv.copy(), x.copy(), focus, context, fb, cb, state,
                            method="adagrad", cost="glove", max_x=5.0, iteration=e, batch=batch)
        return c / entries

    c_seq = run(1)
    c_b64 = run(64)
    c_b256 = run(256)
    assert c_seq < 0.1  # sequential converges
    assert c_b64 < 0.15 and c_b256 < 0.15  # batched lands in the same basin


def test_init_params_deterministic_and_ranged():
    a = init_params(np.array([5, 9, 123456789]), 16, 42)
    b = init_params(np.array([123456789, 5, 9]), 16, 42)
    # same node -> same vector regardless of position/partition
    assert np.array_equal(a[0][0], b[0][1])
    assert np.array_equal(a[0][2], b[0][0])
    # U(-0.5, 0.5)/dim bound (Optimizer.java:50-57)
    assert np.abs(a[0]).max() <= 0.5 / 16
    c = init_params(np.array([5]), 16, 43)
    assert not np.array_equal(a[0][0], c[0][0])  # seed matters


# ---------------------------------------------------------------------------
# Spark harness
# ---------------------------------------------------------------------------

def _tiny_cooc(spark):
    rows = [
        (0, 1, 2.0), (1, 0, 2.0), (0, 2, 1.0), (2, 0, 1.0),
        (1, 2, 3.0), (2, 1, 3.0), (3, 0, 0.5), (0, 3, 0.5),
    ]
    cooc = spark.createDataFrame(rows, "i long, j long, x double")
    nodes = spark.createDataFrame([(i,) for i in range(4)], "node_id long")
    return cooc, nodes


def test_optimize_cost_decreases(spark):
    cooc, nodes = _tiny_cooc(spark)
    res = optimize(
        cooc, nodes, dim=8, co_count=8, max_x=3.0, cost="glove", method="adagrad",
        maxiter=6, tolerance=0.0, seed=42, n_shards=2, batch=1,
    )
    assert len(res.cost_history) == 6
    assert res.cost_history[-1] < res.cost_history[0]
    emb = extract_embeddings(res.params)
    got = emb.orderBy("node_id").collect()
    assert len(got) == 4 and len(got[0]["vec"]) == 8


def test_presharded_epoch_matches_adhoc_at_iteration0(spark):
    """preshard_cooc uses the same iteration-0 block draw as the ad-hoc
    path, so epoch 0 must be BIT-exact either way; later epochs keep the
    fixed membership (the reference's shuffle re-permutes order only)."""
    from graph_embeddings_spark.glove.train import preshard_cooc

    cooc, nodes = _tiny_cooc(spark)
    params = init_params_df(nodes, 4, 42, "adagrad")
    kw = dict(dim=4, method="adagrad", cost="glove", max_x=3.0,
              iteration=0, seed=42, n_shards=4, batch=1)
    a, cost_a = train_epoch(cooc, params, **kw)
    pre = preshard_cooc(cooc, seed=42, n_shards=4).persist()
    b, cost_b = train_epoch(pre, params, **kw)
    rows_a = {r["node_id"]: (list(r["focus"]), list(r["context"]), r["f_bias"]) for r in a.collect()}
    rows_b = {r["node_id"]: (list(r["focus"]), list(r["context"]), r["f_bias"]) for r in b.collect()}
    assert cost_a == pytest.approx(cost_b, rel=0, abs=0)
    assert rows_a == rows_b
    # iteration 1 on the presharded relation still trains (order re-draws)
    c, cost_c = train_epoch(pre, params, **{**kw, "iteration": 1})
    assert cost_c > 0 and c.count() == 4
    pre.unpersist()


def test_extract_embeddings_is_average(spark):
    params = init_params_df(
        spark.createDataFrame([(0,), (1,)], "node_id long"), 4, 42, "adagrad"
    )
    joined = params.join(extract_embeddings(params), "node_id").collect()
    for r in joined:
        for f, c, v in zip(r["focus"], r["context"], r["vec"]):
            assert v == pytest.approx((f + c) / 2, rel=1e-6)


def test_untouched_nodes_keep_params(spark):
    cooc, _ = _tiny_cooc(spark)
    nodes = spark.createDataFrame([(i,) for i in range(6)], "node_id long")  # 4,5 untouched
    params = init_params_df(nodes, 4, 42, "adagrad")
    before = {r["node_id"]: r["focus"] for r in params.collect()}
    new_params, cost = train_epoch(
        cooc, params, dim=4, method="adagrad", cost="glove", max_x=3.0,
        iteration=0, seed=42, n_shards=2, batch=1,
    )
    after = {r["node_id"]: r["focus"] for r in new_params.collect()}
    assert cost > 0
    assert after[4] == before[4] and after[5] == before[5]
    assert after[0] != before[0]  # touched node moved


def test_checkpoint_resume(spark, tmp_path):
    cooc, nodes = _tiny_cooc(spark)
    ckpt = str(tmp_path / "ckpt")
    res = optimize(
        cooc, nodes, dim=4, co_count=8, max_x=3.0, maxiter=2, tolerance=0.0,
        seed=42, n_shards=2, batch=1, checkpoint_dir=ckpt,
    )
    from graph_embeddings_spark.glove.train import resume_params

    reloaded = resume_params(spark, ckpt, 1)
    a = {r["node_id"]: list(r["focus"]) for r in res.params.collect()}
    b = {r["node_id"]: list(r["focus"]) for r in reloaded.collect()}
    assert a == b


def test_find_completed_epochs_and_midrun_resume(spark, tmp_path):
    """A 2-epoch run resumed for 2 more must equal an uninterrupted 4-epoch
    run (same seed: the per-epoch shuffle key is seed+iteration, so the
    resumed epochs replay the identical permutations)."""
    from graph_embeddings_spark.glove.train import find_completed_epochs, resume_params

    cooc, nodes = _tiny_cooc(spark)
    ck1 = str(tmp_path / "interrupted")
    optimize(
        cooc, nodes, dim=4, co_count=8, max_x=3.0, maxiter=2, tolerance=0.0,
        seed=42, n_shards=2, batch=1, checkpoint_dir=ck1,
    )
    assert find_completed_epochs(ck1) == [0, 1]
    resumed = optimize(
        cooc, nodes, dim=4, co_count=8, max_x=3.0, maxiter=4, tolerance=0.0,
        seed=42, n_shards=2, batch=1, checkpoint_dir=ck1,
        start_params=resume_params(spark, ck1, 1), start_epoch=2,
    )
    ck2 = str(tmp_path / "straight")
    straight = optimize(
        cooc, nodes, dim=4, co_count=8, max_x=3.0, maxiter=4, tolerance=0.0,
        seed=42, n_shards=2, batch=1, checkpoint_dir=ck2,
    )
    a = {r["node_id"]: list(r["focus"]) for r in resumed.params.collect()}
    b = {r["node_id"]: list(r["focus"]) for r in straight.params.collect()}
    assert set(a) == set(b)
    for k in a:
        assert a[k] == pytest.approx(b[k], abs=1e-6)
    assert find_completed_epochs(str(tmp_path / "missing")) == []


def test_shards_for_sizing():
    """Work-sized sharding: small coocs get few fat shards (the r2 bench
    anti-scaled at ~2k entries/shard), huge coocs saturate any cluster."""
    from graph_embeddings_spark.glove.train import shards_for

    assert shards_for(63_000) == 4  # lo clamp area
    assert shards_for(640_000) == 4  # fat shards: duplication ~2*sqrt(S)
    assert shards_for(25_000_000) == 50
    assert shards_for(8_000_000) == 16  # measured sweet spot (GLOVE_SCALING)
    assert shards_for(10**12) == 4096  # hi clamp
    assert shards_for(0) == 4  # lo clamp


def test_combine_epoch_matches_hand_values(spark):
    """The Arrow combine reproduces the documented formulas exactly:
    hybrid = delta-sum arrays + per-side mean biases, untouched rows (and
    untouched SIDES of touched rows) pass through."""
    import numpy as np
    from graph_embeddings_spark.glove.train import (
        PARAMS_SCHEMA,
        _SIDE_SCHEMA,
        _combine_epoch,
    )

    hw, tail = 2, 1  # dim-2 adagrad layout: [f0 f1 c0 c1 ftail ctail]

    def row(nid, base, fb):
        return (
            nid,
            [float(base)] * 2,          # focus
            [float(base + 1)] * 2,      # context
            float(fb), float(fb + 1),   # biases
            [float(base + 2)] * 6,      # state
        )

    def copy(nid, side, base, b):
        # packed _SIDE_SCHEMA blob: [vec(2) | state_half(3) | bias]
        return (nid, side, [float(base)] * 2 + [float(base + 2)] * 3 + [float(b)])

    params = spark.createDataFrame([row(1, 10.0, 1.0), row(2, 20.0, 2.0)], PARAMS_SCHEMA)
    # node 1: focus side touched by two shards (11, 13), context side by ONE
    copies = spark.createDataFrame(
        [copy(1, 0, 11.0, 3.0), copy(1, 0, 13.0, 5.0), copy(1, 1, 12.0, 6.0)],
        _SIDE_SCHEMA,
    )
    got = {r["node_id"]: r for r in _combine_epoch(copies, params, "hybrid", hw, tail).collect()}
    assert np.allclose(got[1]["focus"], [14.0, 14.0])          # 10 + (11-10) + (13-10)
    assert np.allclose(got[1]["context"], [12.0, 12.0])        # 11 + (12-11)
    assert got[1]["f_bias"] == pytest.approx(4.0)              # mean(3, 5)
    assert got[1]["c_bias"] == pytest.approx(6.0)              # mean over trained copies only
    # state halves recombined into the full layout
    assert np.allclose(got[1]["state"], [16.0, 16.0, 14.0, 14.0, 16.0, 14.0])
    assert np.allclose(got[2]["focus"], [20.0, 20.0])          # untouched
    assert got[2]["f_bias"] == pytest.approx(2.0)
    assert np.allclose(got[2]["state"], [22.0] * 6)

    got_m = {r["node_id"]: r for r in _combine_epoch(copies, params, "mean", hw, tail).collect()}
    assert np.allclose(got_m[1]["focus"], [12.0, 12.0])        # mean(11, 13)
    got_s = {r["node_id"]: r for r in _combine_epoch(copies, params, "sum_delta", hw, tail).collect()}
    assert got_s[1]["f_bias"] == pytest.approx(1.0 + 2.0 + 4.0)  # delta sum


def test_missing_param_node_fails_loudly(spark):
    """A cooc endpoint absent from params (or a preshard built under a
    different seed/n_shards than the param shipping) must raise, not
    silently train a neighbouring node's row through the vectorized
    searchsorted mapping."""
    cooc, _ = _tiny_cooc(spark)  # touches node ids 0..3
    nodes = spark.createDataFrame([(0,), (1,), (2,)], "node_id long")  # 3 missing
    params = init_params_df(nodes, 4, 42, "adagrad")
    import py4j.protocol
    with pytest.raises((py4j.protocol.Py4JJavaError, Exception)) as exc:
        new_params, _ = train_epoch(
            cooc, params, dim=4, method="adagrad", cost="glove", max_x=3.0,
            iteration=0, seed=42, n_shards=2, batch=1,
        )
        new_params.collect()
    assert "missing from shipped params" in str(exc.value)


def test_convergence_marker_and_final_cost(spark, tmp_path):
    """A tolerance break writes _CONVERGED; a maxiter run reports the last
    epoch's cost as final_cost instead of the 0.0 placeholder."""
    from graph_embeddings_spark.glove.train import converged_epoch, optimize

    cooc, nodes = _tiny_cooc(spark)
    ckpt = str(tmp_path / "params")
    # huge tolerance: the second epoch's |diff| is within it -> early break
    res = optimize(
        cooc, nodes, dim=4, co_count=8, max_x=3.0, cost="glove", method="adagrad",
        maxiter=10, tolerance=1e9, seed=42, n_shards=2, batch=1, checkpoint_dir=ckpt,
    )
    conv = converged_epoch(ckpt)
    assert conv is not None and conv == res.epochs_run - 1
    assert res.final_cost == pytest.approx(res.cost_history[-1])
    # maxiter run (zero tolerance): final_cost must be the last real cost
    res2 = optimize(
        cooc, nodes, dim=4, co_count=8, max_x=3.0, cost="glove", method="adagrad",
        maxiter=3, tolerance=0.0, seed=42, n_shards=2, batch=1,
    )
    assert res2.final_cost == pytest.approx(res2.cost_history[-1])
    assert res2.final_cost > 0.0


def test_pglove_rejects_out_of_domain_x():
    """The logit link is undefined for x >= 1: raw counts must raise, not
    silently train NaN into every touched row."""
    import numpy as np

    from graph_embeddings_spark.glove.kernel import inner_and_weight

    z = np.zeros(1)
    with pytest.raises(ValueError, match="pglove"):
        inner_and_weight("pglove", np.array([1.0]), z, z, z, max_x=1.0)
    with pytest.raises(ValueError, match="pglove"):
        inner_and_weight("pglove", np.array([3.0]), z, z, z, max_x=1.0)
    inner, w = inner_and_weight("pglove", np.array([0.5]), z, z, z, max_x=1.0)
    assert np.isfinite(inner).all()


def test_retrain_clears_stale_convergence_state(spark, tmp_path):
    """Restarting training from epoch 0 over an old checkpoint dir must
    clear the prior _CONVERGED marker and the stale high-epoch params —
    otherwise a crash mid-retrain would later 'resume' into the OLD run's
    parameters."""
    import os

    from graph_embeddings_spark.glove.train import (
        converged_epoch, find_completed_epochs, mark_converged, optimize,
    )

    cooc, nodes = _tiny_cooc(spark)
    ckpt = str(tmp_path / "params")
    kw = dict(dim=4, co_count=8, max_x=3.0, cost="glove", method="adagrad",
              seed=42, n_shards=2, batch=1, checkpoint_dir=ckpt)
    optimize(cooc, nodes, maxiter=3, tolerance=0.0, **kw)  # run A: 3 epochs
    mark_converged(ckpt, 2, 0.5)  # as if A's tolerance break fired at epoch 2
    assert sorted(find_completed_epochs(ckpt)) == [0, 1, 2]

    # retrain from scratch but stop after ONE epoch (stands in for a crash
    # mid-retrain: fewer epochs completed than run A had)
    optimize(cooc, nodes, maxiter=1, tolerance=0.0, **kw)
    assert converged_epoch(ckpt) is None  # stale marker gone
    left = find_completed_epochs(ckpt)
    assert max(left) == 0  # run A's higher epochs were purged
    assert os.path.isdir(os.path.join(ckpt, "params_epoch=0000"))
