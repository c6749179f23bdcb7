"""Training-step tests: loss decreases, checkpoint round-trip, schedules."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deep_prob_feature_track_tpu.models.presets import get_preset
from deep_prob_feature_track_tpu.models.tracker import LeastSquareTracking
from deep_prob_feature_track_tpu.training import checkpoints
from deep_prob_feature_track_tpu.training.train import (
    TrainConfig,
    compute_loss,
    create_train_state,
    make_lr_schedule,
    make_optimizer,
    make_train_step,
)


def synthetic_batch(rng, B=2, H=32, W=40):
    K = np.tile([[0.6 * W, 0.6 * W, (W - 1) / 2.0, (H - 1) / 2.0]], (B, 1)).astype(
        np.float32
    )
    T = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    T[:, :3, 3] = rng.randn(B, 3) * 0.01
    return {
        "color0": rng.rand(B, 3, H, W).astype(np.float32),
        "color1": rng.rand(B, 3, H, W).astype(np.float32),
        "depth0": rng.uniform(0.5, 3.0, (B, 1, H, W)).astype(np.float32),
        "depth1": rng.uniform(0.5, 3.0, (B, 1, H, W)).astype(np.float32),
        "calib": K,
        "transform": T,
        "pad_mask": np.ones((B,), bool),
    }


def test_lr_schedule():
    cfg = TrainConfig(lr=4e-4, lr_decay_epochs=(2, 4))
    sched = make_lr_schedule(cfg, steps_per_epoch=10)
    np.testing.assert_allclose(float(sched(0)), 4e-4)
    np.testing.assert_allclose(float(sched(25)), 2e-4)
    np.testing.assert_allclose(float(sched(45)), 1e-4)


def test_train_step_reduces_loss(rng):
    cfg = get_preset("feature")
    net = LeastSquareTracking(cfg=cfg)
    tcfg = TrainConfig(lr=3e-4)
    opt = make_optimizer(tcfg, steps_per_epoch=10)
    batch = synthetic_batch(rng)
    state = create_train_state(net, opt, batch)
    step = make_train_step(net, tcfg, opt)
    losses = []
    for _ in range(6):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
        assert np.isfinite(losses[-1])
        assert np.isfinite(float(metrics["grad_norm"]))
    # single-batch overfitting through the nonconvex 12-solve unroll
    # oscillates; require substantial descent somewhere in the window
    assert min(losses) < 0.5 * losses[0], losses


def test_loss_variants_finite(rng):
    import dataclasses

    batch = synthetic_batch(rng)
    for loss_name in ("EPE3D", "RPE", "UEPE3D", "URPE"):
        cfg = get_preset("feature")
        if loss_name in ("UEPE3D", "URPE"):
            cfg = dataclasses.replace(cfg, uncer_prop=True)
        net = LeastSquareTracking(cfg=cfg)
        variables = net.init(
            jax.random.PRNGKey(0),
            jnp.asarray(batch["color0"]),
            jnp.asarray(batch["color1"]),
            jnp.asarray(batch["depth0"]),
            jnp.asarray(batch["depth1"]),
            jnp.asarray(batch["calib"]),
            train=False,
        )
        loss, stats = compute_loss(
            net,
            TrainConfig(loss=loss_name),
            variables["params"],
            variables["batch_stats"],
            {k: jnp.asarray(v) for k, v in batch.items()},
        )
        assert np.isfinite(float(loss)), loss_name


def test_checkpoint_roundtrip(rng, tmp_path):
    cfg = get_preset("feature")
    net = LeastSquareTracking(cfg=cfg)
    tcfg = TrainConfig()
    opt = make_optimizer(tcfg, steps_per_epoch=10)
    batch = synthetic_batch(rng)
    state = create_train_state(net, opt, batch)
    step = make_train_step(net, tcfg, opt)
    state, _ = step(state, batch)

    path = str(tmp_path / "ckpt.msgpack")
    checkpoints.save_train_state(path, state)

    fresh = create_train_state(net, opt, batch)
    restored = checkpoints.restore_train_state(path, fresh)
    assert int(restored.step) == 1
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer state restored too (the reference dropped it; we must not)
    for a, b in zip(
        jax.tree.leaves(state.opt_state), jax.tree.leaves(restored.opt_state)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_debug_nan_checking(rng):
    """checkify wrapper must catch NaN production inside a jitted step."""
    import jax.numpy as jnp
    import pytest
    from jax.experimental import checkify

    from deep_prob_feature_track_tpu.utils.debug import checked

    @jax.jit
    def bad_fn(x):
        return jnp.log(x - 10.0)  # NaN for x < 10

    wrapped = checked(bad_fn, jit=False)
    with pytest.raises(checkify.JaxRuntimeError):
        wrapped(jnp.asarray([1.0]))
    # clean input passes through
    out = wrapped(jnp.asarray([20.0]))
    assert np.isfinite(float(out[0]))


def test_orbax_checkpoint_roundtrip(rng, tmp_path):
    pytest.importorskip("orbax.checkpoint")
    cfg = get_preset("RGB")
    net = LeastSquareTracking(cfg=cfg)
    tcfg = TrainConfig()
    opt = make_optimizer(tcfg, steps_per_epoch=10)
    batch = synthetic_batch(rng, H=16, W=20)
    state = create_train_state(net, opt, batch)
    step = make_train_step(net, tcfg, opt)
    state, _ = step(state, batch)

    path = str(tmp_path / "orbax_ckpt")
    checkpoints.save_orbax(path, jax.device_get(state))
    fresh = create_train_state(net, opt, batch)
    restored = checkpoints.restore_orbax(path, fresh)
    assert int(restored.step) == 1


def test_guard_nonfinite_skips_bad_batch(rng):
    cfg = get_preset("RGB")
    net = LeastSquareTracking(cfg=cfg)
    tcfg = TrainConfig()
    opt = make_optimizer(tcfg, steps_per_epoch=10)
    batch = synthetic_batch(rng, H=16, W=20)
    state = create_train_state(net, opt, batch)
    step = make_train_step(net, tcfg, opt, guard_nonfinite=True)

    bad = dict(batch)
    bad["color0"] = np.full_like(batch["color0"], np.nan)
    state1, metrics = step(state, bad)
    assert bool(metrics["skipped"])
    # params untouched, but the step counter advanced
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(state1.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(state1.step) == int(state.step) + 1

    state2, metrics2 = step(state1, batch)
    assert not bool(metrics2["skipped"])


def test_scan_remat_loop_gradient_parity(rng, monkeypatch):
    """DPFT_TRAIN_LOOP=scan_remat (lax.scan over a jax.checkpoint'ed GN
    body, the 480x640 training enabler — see
    solvers/trust_region.py::run_gn_iterations) must reproduce the
    unrolled path's loss AND parameter gradients."""
    cfg = get_preset("feature")
    net = LeastSquareTracking(cfg=cfg)
    batch = synthetic_batch(rng)
    tcfg = TrainConfig()

    def loss_and_grads():
        # fresh jit per call: the loop mode is read from the env at trace
        # time (same mechanism as the benchmarks' A/B flags)
        def loss_fn(params, batch_stats):
            loss, _ = compute_loss(net, tcfg, params, batch_stats, batch)
            return loss

        variables = net.init(
            jax.random.PRNGKey(0),
            *(jnp.asarray(batch[k]) for k in
              ("color0", "color1", "depth0", "depth1", "calib")),
            train=True,
        )
        l, g = jax.jit(jax.value_and_grad(loss_fn))(
            variables["params"], variables.get("batch_stats", {})
        )
        return float(l), jax.tree_util.tree_map(np.asarray, g)

    monkeypatch.delenv("DPFT_TRAIN_LOOP", raising=False)
    monkeypatch.delenv("DPFT_REMAT_ENCODER", raising=False)
    l0, g0 = loss_and_grads()
    monkeypatch.setenv("DPFT_TRAIN_LOOP", "scan_remat")
    l1, g1 = loss_and_grads()
    # the full VGA memory configuration: remat'ed encoder on top
    monkeypatch.setenv("DPFT_REMAT_ENCODER", "1")
    l2, g2 = loss_and_grads()

    leaves0 = jax.tree_util.tree_leaves(g0)
    for l1_, g1_ in ((l1, g1), (l2, g2)):
        assert abs(l0 - l1_) < 1e-4 * max(abs(l0), 1e-3), (l0, l1_)
        leaves1 = jax.tree_util.tree_leaves(g1_)
        assert len(leaves0) == len(leaves1)
        for a, b in zip(leaves1, leaves0):
            # scan+remat reorders accumulations vs the Python unroll; f32
            # noise through 12 chained GN solves measures ~2e-3 relative
            np.testing.assert_allclose(
                a, b, rtol=0, atol=5e-3 * max(np.abs(b).max(), 1e-6)
            )


def _ufc_learned_mest_cfg():
    import dataclasses

    # forward-compositional track with a LEARNED M-estimator applied inside
    # the GN body — the hardest case for lax-control-flow loops.  Keep the
    # preset's sfm_net init: at an EXACTLY-identity init pose the warp
    # coordinates sit bitwise on the frame-edge in-bounds boundaries, and
    # XLA's different fusion inside a lax.scan body legitimately flips
    # those comparisons (discrete occ-mask flips, huge at test
    # resolutions where edge pixels are ~1/8 of the image) — both
    # roundings are valid, so the parity test must avoid the degenerate
    # config rather than loosen tolerances past meaning.
    return dataclasses.replace(
        get_preset("feature"), direction="forward", mest_type="MultiScale2w",
        train_init_pose=False,
    )


@pytest.mark.parametrize("cfg_name", ["DeepIC", "ufc_learned_mest"])
def test_scan_remat_flax_module_loops_gradient_parity(rng, monkeypatch, cfg_name):
    """Tracks whose GN bodies apply learned modules (the Direct-ResVol
    damping MLP of DeepIC, a learned U_FC M-estimator) take the scan_remat
    path too — via pure clone-apply twins of the bound flax modules
    (LeastSquareTracking._functional, VERDICT round-2 item 6) — and must
    reproduce the unrolled path's loss (and, where the problem is
    well-conditioned, its parameter gradients).

    The learned-mest U_FC case checks the LOSS only: at an untrained init
    its net-level gradient is measurably chaotic — a 1-ulp perturbation of
    ``color0`` moves the largest gradient leaves by ~35% of the global
    gradient max (random sigma heads -> near-singular JtWJ; discrete
    occ/floor flips amplified through 12 GN solves) — so comparing
    gradient VALUES between any two XLA compilations tests fusion
    determinism, not our code.  Its semantic gradient parity is covered at
    the solver level by test_tr_ufc_scan_remat_learned_mest_solver_parity,
    where conditioning is controlled."""
    cfg = get_preset("DeepIC") if cfg_name == "DeepIC" else _ufc_learned_mest_cfg()
    net = LeastSquareTracking(cfg=cfg)
    batch = synthetic_batch(rng)
    tcfg = TrainConfig()
    variables = net.init(
        jax.random.PRNGKey(0),
        *(jnp.asarray(batch[k]) for k in
          ("color0", "color1", "depth0", "depth1", "calib")),
        train=True,
    )

    def loss_and_grads():
        def loss_fn(params, batch_stats):
            loss, _ = compute_loss(net, tcfg, params, batch_stats, batch)
            return loss

        l, g = jax.jit(jax.value_and_grad(loss_fn))(
            variables["params"], variables.get("batch_stats", {})
        )
        return float(l), jax.tree_util.tree_map(np.asarray, g)

    monkeypatch.delenv("DPFT_TRAIN_LOOP", raising=False)
    l0, g0 = loss_and_grads()
    monkeypatch.setenv("DPFT_TRAIN_LOOP", "scan_remat")
    l1, g1 = loss_and_grads()

    assert np.isfinite(l0)
    assert abs(l0 - l1) < 1e-3 * max(abs(l0), 1e-3), (l0, l1)
    leaves0 = jax.tree_util.tree_leaves(g0)
    leaves1 = jax.tree_util.tree_leaves(g1)
    assert len(leaves0) == len(leaves1)
    assert all(np.all(np.isfinite(b)) for b in leaves1)
    if cfg_name == "DeepIC":
        for a, b in zip(leaves1, leaves0):
            # scan+remat reorders accumulations vs the Python unroll (same
            # tolerance rationale as test_scan_remat_loop_gradient_parity)
            np.testing.assert_allclose(
                a, b, rtol=0, atol=5e-3 * max(np.abs(b).max(), 1e-6)
            )


def test_tr_ufc_scan_remat_learned_mest_solver_parity(rng, monkeypatch):
    """Solver-level gradient parity for the learned-mest U_FC loop under
    scan_remat, with the conditioning controlled (constant sigma, smooth
    objective): applying a flax MultiScale2w estimator as a pure
    clone-apply callable inside lax.scan + jax.checkpoint must reproduce
    the Python unroll's gradients wrt both the estimator parameters and
    the features (measured delta ~4e-5 rel; tolerance 1e-3)."""
    from deep_prob_feature_track_tpu.geometry.lie import exp_so3
    from deep_prob_feature_track_tpu.models.nets import DeepRobustEstimator
    from deep_prob_feature_track_tpu.solvers import trust_region as TR

    B, C, H, W = 2, 3, 16, 20
    x0 = jnp.asarray(rng.rand(B, C, H, W).astype(np.float32))
    x1 = jnp.asarray(rng.rand(B, C, H, W).astype(np.float32))
    d0 = jnp.asarray(rng.uniform(0.6, 3.0, (B, 1, H, W)).astype(np.float32))
    d1 = jnp.asarray(rng.uniform(0.6, 3.0, (B, 1, H, W)).astype(np.float32))
    s0 = jnp.ones((B, 1, H, W), jnp.float32) * 0.5
    s1 = jnp.ones((B, 1, H, W), jnp.float32) * 0.5
    K = jnp.asarray(
        np.tile([[13.0, 13.0, (W - 1) / 2, (H - 1) / 2]], (B, 1)).astype(np.float32)
    )
    # non-identity init pose: exactly-identity warps land bitwise on the
    # frame-edge comparisons and flip under different XLA fusions
    R0 = exp_so3(jnp.asarray((rng.randn(B, 3) * 0.01).astype(np.float32)))
    t0 = jnp.asarray((rng.randn(B, 3) * 0.02).astype(np.float32))
    wp = jnp.ones((B, 1, H, W), jnp.float32) * 0.001
    mest_mod = DeepRobustEstimator("MultiScale2w")
    mvars = mest_mod.init(
        jax.random.PRNGKey(1), jnp.zeros_like(x0), x0, x1, wp, train=True
    )
    rest = {k: v for k, v in mvars.items() if k != "params"}
    solver = TR.DirectSolver(kind="nodamping", direction="forward")

    def run():
        def loss_fn(params, xx):
            def mest(res, f0, f1, wprior):
                out = mest_mod.apply(
                    {"params": params, **rest}, res, f0, f1, wprior,
                    train=True, mutable=["batch_stats"],
                )
                return out[0]

            (R, t), w, _ = TR.tr_ufc_level(
                (R0, t0), xx, x1, d0, d1, K, s0, s1, mest, solver,
                w_prior=wp, max_iter=3, unroll=True,
            )
            return jnp.abs(R).mean() * 100 + jnp.abs(t).mean() * 100 + w.mean()

        return jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1)))(
            mvars["params"], x0
        )

    monkeypatch.delenv("DPFT_TRAIN_LOOP", raising=False)
    la, ga = run()
    monkeypatch.setenv("DPFT_TRAIN_LOOP", "scan_remat")
    lb, gb = run()
    assert abs(float(la) - float(lb)) < 1e-4 * max(abs(float(la)), 1e-3)
    for a, b in zip(jax.tree_util.tree_leaves(ga), jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=0,
            atol=1e-3 * max(float(np.abs(np.asarray(a)).max()), 1e-6),
        )


@pytest.mark.parametrize("loop_mode", [None, "scan_remat"])
def test_ufc_learned_mest_batch_stats_compounded_ema(rng, monkeypatch, loop_mode):
    """Pin the register_stats BatchNorm semantics (round-3 advisor medium):
    the reference applies the bound M-estimator once per GN iteration
    (algorithms.py:1066), so the running-stat EMA compounds max_iter times
    per level.  The pure-twin loop + post-loop bound re-applies
    (tr_ufc_level register_stats) must produce the SAME batch_stats
    trajectory as the plain bound-module unroll (forced here by patching
    _functional to return None, which flips the track to the unrolled
    bound path with register_stats=False)."""
    cfg = _ufc_learned_mest_cfg()
    net = LeastSquareTracking(cfg=cfg)
    batch = synthetic_batch(rng)
    inputs = tuple(
        jnp.asarray(batch[k])
        for k in ("color0", "color1", "depth0", "depth1", "calib")
    )
    variables = net.init(jax.random.PRNGKey(0), *inputs, train=True)
    assert "batch_stats" in variables  # MultiScale2w really has BN stats

    def run_stats():
        _, mut = net.apply(variables, *inputs, train=True,
                           mutable=["batch_stats"])
        return jax.tree_util.tree_map(np.asarray, mut["batch_stats"])

    if loop_mode is None:
        monkeypatch.delenv("DPFT_TRAIN_LOOP", raising=False)
    else:
        monkeypatch.setenv("DPFT_TRAIN_LOOP", loop_mode)
    got = run_stats()

    # reference semantics: bound module applied inside the Python unroll
    monkeypatch.setattr(LeastSquareTracking, "_functional",
                        lambda self, mod: None)
    monkeypatch.delenv("DPFT_TRAIN_LOOP", raising=False)
    want = run_stats()

    leaves_got = jax.tree_util.tree_leaves(got)
    leaves_want = jax.tree_util.tree_leaves(want)
    assert len(leaves_got) == len(leaves_want) and len(leaves_got) > 0
    # Python-unroll pure twin vs bound: identical op sequences -> tight.
    # scan_remat: the lax.scan body fuses differently, so the GN residual
    # trajectory (and hence the BN batch inputs) drifts at ulp scale
    # through 12 solves — measured 2e-4 abs on the stats.  The semantics
    # bug this test pins (one EMA update instead of max_iter compounded
    # ones) moves the mean stats by O(the (1-momentum)*stat_i terms) ~
    # 50%+ relative, far above either tolerance.
    tol = 1e-5 if loop_mode is None else 1e-2
    for a, b in zip(leaves_got, leaves_want):
        np.testing.assert_allclose(
            a, b, rtol=0, atol=tol * max(float(np.abs(b).max()), 1e-6)
        )


def test_optimizer_parity_vs_torch():
    """Optimizer semantics parity: 3 steps of our optax chain
    (clip -> +wd*param -> moments -> lr) must reproduce torch's
    clip_grad_norm_ + Adam/SGD(weight_decay=4e-4) updates (the
    reference's create_optim, train_utils.py:42-63 + train.py clip)."""
    torch = pytest.importorskip("torch")
    import optax

    shapes = [(7, 5), (13,), (3, 2, 4)]
    rng_ = np.random.RandomState(7)
    init = [rng_.randn(*s).astype(np.float32) for s in shapes]
    grad_seq = [
        [20.0 * rng_.randn(*s).astype(np.float32) for s in shapes]  # big: clips
        for _ in range(3)
    ]

    for opt_name, make_torch in (
        ("adam", lambda ps: torch.optim.Adam(ps, lr=5e-4, weight_decay=4e-4)),
        ("sgd", lambda ps: torch.optim.SGD(
            ps, lr=5e-4, momentum=0.9, weight_decay=4e-4, nesterov=False)),
    ):
        # torch side
        t_params = [torch.nn.Parameter(torch.from_numpy(p.copy())) for p in init]
        t_opt = make_torch(t_params)
        for grads in grad_seq:
            for p, g in zip(t_params, grads):
                p.grad = torch.from_numpy(g.copy())
            torch.nn.utils.clip_grad_norm_(t_params, 5.0)
            t_opt.step()

        # our side (constant lr: schedule boundaries not hit in 3 steps)
        cfg = TrainConfig(lr=5e-4, opt=opt_name)
        opt = make_optimizer(cfg, steps_per_epoch=1000)
        params = [jnp.asarray(p) for p in init]
        state = opt.init(params)
        for grads in grad_seq:
            updates, state = opt.update(
                [jnp.asarray(g) for g in grads], state, params
            )
            params = optax.apply_updates(params, updates)

        for a, b in zip(params, t_params):
            np.testing.assert_allclose(
                np.asarray(a), b.detach().numpy(), atol=1e-6,
                err_msg=opt_name,
            )


@pytest.mark.parametrize("loop", ["scan", "host"])
def test_grad_accumulation_matches_sequential_microbatches(rng, loop):
    """accum_steps=k inside ONE jitted step must reproduce k sequential
    half-batch value_and_grad calls with chained BatchNorm stats and
    averaged grads (the per-GPU DataParallel semantics, ref
    train.py:295-298).  Tolerance is calibrated from the manual program's
    own 1e-6-input-perturbation self-divergence: backprop through 12
    unrolled GN solves amplifies f32 rounding chaotically (round-3
    measurement, see docstrings above), so structurally different but
    mathematically identical programs can only be compared inside that
    envelope."""
    import dataclasses

    import jax.flatten_util as fu

    B = 4
    batch = synthetic_batch(rng, B=B)
    batch_p = {k: (v + 1e-6 if k == "color0" else v) for k, v in batch.items()}
    net = LeastSquareTracking(cfg=get_preset("feature"))
    tcfg = TrainConfig(batch_size=B)
    opt = make_optimizer(tcfg, 100)
    s0 = create_train_state(net, opt, batch)

    def lg(stats, b):
        return jax.value_and_grad(
            lambda p: compute_loss(net, tcfg, p, stats, b), has_aux=True
        )(s0.params)

    def manual(b):
        h1 = {k: v[: B // 2] for k, v in b.items()}
        h2 = {k: v[B // 2:] for k, v in b.items()}
        (l1, st1), g1 = lg(s0.batch_stats, h1)
        (l2, st2), g2 = lg(st1, h2)
        return (
            (l1 + l2) / 2,
            jax.tree.map(lambda a, c: (a + c) / 2, g1, g2),
            st2,
        )

    lm, gm, stm = manual(batch)
    lp, gp, _ = manual(batch_p)
    env_l = abs(float(lm - lp)) + 1e-6
    ga, gb = fu.ravel_pytree(gm)[0], fu.ravel_pytree(gp)[0]
    env_g = float(jnp.max(jnp.abs(ga - gb))) + 1e-6

    step = make_train_step(
        net, dataclasses.replace(tcfg, accum_steps=2, accum_loop=loop), opt
    )
    s_new, metrics = step(create_train_state(net, opt, batch), batch)
    assert abs(float(metrics["loss"]) - float(lm)) < 3 * env_l
    # grad_norm is a scalar summary of the averaged grads
    gn_manual = float(jnp.linalg.norm(ga))
    assert abs(float(metrics["grad_norm"]) - gn_manual) < 3 * env_g * np.sqrt(
        ga.size
    ) + 1e-3 * gn_manual
    # chained (not parallel-averaged) BatchNorm stats: exact, no solver in
    # the stats path at eval... stats come from the encoder forward, which
    # is NOT chaotic — require tight agreement
    sa = fu.ravel_pytree(s_new.batch_stats)[0]
    sb = fu.ravel_pytree(stm)[0]
    np.testing.assert_allclose(np.asarray(sa), np.asarray(sb), atol=1e-5)


def test_grad_accumulation_full_batch_equivalence_loss_scale(rng):
    """accum_steps=1 vs accum_steps=2 train the same model family: one
    optimizer step from the same init must land within the chaos envelope
    (pinning that the accumulated update is applied ONCE, not k times)."""
    import dataclasses

    import jax.flatten_util as fu

    B = 4
    batch = synthetic_batch(rng, B=B)
    net = LeastSquareTracking(cfg=get_preset("feature"))
    tcfg = TrainConfig(batch_size=B)
    opt = make_optimizer(tcfg, 100)

    outs = {}
    for k in (1, 2):
        step = make_train_step(
            net, dataclasses.replace(tcfg, accum_steps=k), opt
        )
        s, m = step(create_train_state(net, opt, batch), batch)
        outs[k] = (fu.ravel_pytree(s.params)[0], float(m["loss"]))
    p1, l1 = outs[1]
    p2, l2 = outs[2]
    # one Adam step moves params by ~lr; the two programs' grads differ
    # only by microbatch-vs-batch BN statistics + chaos, so the UPDATES
    # agree to a loose envelope while a double-apply would be ~2x off
    d = float(jnp.linalg.norm(p2 - p1))
    base = float(jnp.linalg.norm(p1))
    assert d < 5e-2 * base, (d, base)
