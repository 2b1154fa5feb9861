"""Batched DRT inversion: vmapped QPHB fits sharded across a TPU mesh.

This replaces the reference's serial per-observation loop
(reference hybdrt/mapping/drtmd.py:303-319, "seconds per observation") with a
single XLA computation: all observations share the measurement grid and basis
(the DRTMD mapping workload already enforces a shared tau supergrid,
reference drtmd.py:23,39-43), so the design matrices, penalty matrices, and
variance matrices are built once and the per-spectrum fit — weight
initialization QP, the full self-tuning outer loop, and uncertainty extraction
— is vmapped over the batch and sharded over devices.
"""
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..solver import fitcore, qphb as qphb_mod
from ..solver.qphb import QPHBConfig
from ..models.drt import DRT, _hypers_to_pytree
from . import sharding as sh
from ..utils.device import host_cpu, on_host


_PACK_JITS = {}


def _fetch_states(states, drop=(), lazy=()):
    """Transfer a device FitState to host as ONE packed array.

    collect() reads ~11 state fields; a per-field ``np.asarray`` costs one
    tunneled device->host round trip each (~26 ms RTT measured), so the
    readback (~0.33 s at B=1024) dominated the 0.22 s batched fit compute.
    Packing all fields into a single (B, K) array on device and
    transferring once cuts it to ~0.07 s. Casts are exact: ``it`` < 2**24
    in float32, ``converged`` is 0/1.

    ``drop`` names fields to leave OUT of the transfer (returned as None):
    the QP warm-start duals and outlier weights are a third of the packed
    bytes but are only consumed device-side, so the default collect path
    skips them (return_states=True keeps everything).

    ``lazy`` names fields to leave out of the transfer but KEEP as device
    arrays: a later ``np.asarray`` on one fetches it on demand. Over the
    tunneled chip the download runs at ~35 MB/s, so deferring the solver
    internals nobody may read (weights + s_vectors = 80% of the packed
    bytes at bench shapes) is a direct e2e win (fit(collect="lazy")).

    Returns the same NamedTuple type with host numpy fields. No-op when the
    state is already on host (adaptive scheduling assembles host arrays).
    """
    enq = _enqueue_pack(states, drop=drop, lazy=lazy)
    if enq is None:
        return states
    return _finish_pack(*enq)


def _enqueue_pack(states, drop=(), lazy=()):
    """Enqueue the packed-readback program WITHOUT blocking on the fetch.

    Returns (packed_device_array, shapes, states) for _finish_pack, or None
    when the state is already on host. Split from _fetch_states so
    fit_stream can enqueue batch N's readback BEFORE dispatching batch
    N+1's compute: the device stream executes in enqueue order, so the
    tiny pack runs immediately after batch N's fit and the host-side fetch
    overlaps batch N+1's compute instead of queueing behind it.
    """
    if isinstance(states.x, np.ndarray):
        return None
    if drop:
        states = states._replace(**{f: None for f in drop
                                    if getattr(states, f) is not None})
    fields = [f for f in states._fields
              if getattr(states, f) is not None and f not in lazy]
    dtype = states.x.dtype  # f32 on TPU, f64 on the CPU parity path
    shapes = tuple((f, tuple(getattr(states, f).shape)) for f in fields)
    key = (type(states), shapes, str(dtype))
    pack = _PACK_JITS.get(key)
    if pack is None:
        def pack_fn(s):
            b = s.x.shape[0]
            return jnp.concatenate(
                [jnp.reshape(getattr(s, f), (b, -1)).astype(dtype)
                 for f in fields], axis=1)
        pack = _PACK_JITS[key] = jax.jit(pack_fn)
    return pack(states), shapes, states


def _finish_pack(packed_dev, shapes, states):
    """Block on the packed readback and unpack to host numpy fields."""
    packed = np.asarray(packed_dev)
    out, col = {}, 0
    for f, shape in shapes:
        size = int(np.prod(shape[1:], dtype=np.int64)) if len(shape) > 1 else 1
        flat = packed[:, col:col + size]
        col += size
        arr = flat.reshape(shape)
        orig_dtype = getattr(states, f).dtype
        if arr.dtype != orig_dtype:
            arr = arr.astype(orig_dtype)
        out[f] = arr
    return states._replace(**out)


def _bucket_pad(rzv, b_orig):
    """Pad the batch axis to the next power of two by repeating row 0.

    Incremental mapping workloads fit a different batch size each
    acquisition; without bucketing every new size re-traces and re-compiles
    the jitted batch entry. Duplicate lanes converge like the real lane (no
    stragglers added) and collect() slices them off via b_orig."""
    b_pad = 1 << (b_orig - 1).bit_length()
    if b_pad > b_orig:
        rzv = np.concatenate([rzv, np.repeat(rzv[:1], b_pad - b_orig, axis=0)])
    return rzv


def _loop_inputs(fitter, rzv, fcfg=None):
    """Shared solver-input setup for one spectrum/observation: weight
    initialization + initial state vectors, returned as the positional
    argument tuple of fitcore.qphb_fit_loop/qphb_fit_scan (plus the
    estimated weights, which the phased scheduler needs separately).

    Used by the plain, history, and phased fit variants of both batch
    fitter classes so their setups cannot desynchronize.

    Weight initialization solves a severely ill-conditioned overfit QP
    (cond ~ 1e7, reference qphb.py:1609). In float64 runs it solves at
    full precision; in float32 runs we rely on the Jacobi equilibration
    inside solve_qp_box. (float64 emulation on the axon TPU stack is
    unstable — it kernel-faults the worker — so no cross-dtype upcast.)"""
    cfg = fitter.cfg
    n = fitter.rzm.shape[1]
    dtype = rzv.dtype
    rho0 = jnp.asarray(fitter.hypers["rho_0"], dtype=dtype)
    dop_rho0 = jnp.asarray(fitter.hypers.get("dop_rho_0", np.ones(3)),
                           dtype=dtype)
    s0 = jnp.stack([jnp.full(n, float(fitter.hypers["s_0"][i]), dtype=dtype)
                    for i in range(cfg.k_range)])
    est, init_w, _, out_t = qphb_mod.initialize_weights(
        fitter.iw_hyp, fitter.m_stack, rho0, dop_rho0, s0, rzv,
        fitter.rzm, fitter.vmm, fitter.lb, cfg, outlier_p=None)
    x0 = jnp.full(n, 1e-6, dtype=dtype)
    dop_gmat = None if fitter.dop_gmat is None \
        else jnp.asarray(fitter.dop_gmat, dtype=dtype)
    # vz-offset machinery exists only on the hybrid fitter; EIS runs with
    # inert placeholders
    rzm_vz = getattr(fitter, "rzm_vz", None)
    if rzm_vz is None:
        rzm_vz = jnp.zeros_like(fitter.rzm)
    vz_strength = getattr(fitter, "vz_strength_vec", None)
    if vz_strength is None:
        vz_strength = jnp.ones(fitter.rzm.shape[0], dtype=dtype)
    one = jnp.asarray(1.0, dtype=dtype)
    args = (fitter.rzm, rzv, fitter.vmm, fitter.m_stack, dop_gmat,
            fitter.l1v, fitter.lb, fitter.hyp, x0, s0, rho0, dop_rho0,
            init_w, est, out_t, rzm_vz, vz_strength, one, one, one,
            fitter.fcfg if fcfg is None else fcfg)
    return args, est


class BatchFitResult(NamedTuple):
    """Physical-units results for a batch of spectra (leading axis = batch)."""
    x: np.ndarray              # (B, n_tau) DRT coefficients
    r_inf: np.ndarray          # (B,)
    inductance: np.ndarray     # (B,)
    c_inv: np.ndarray          # (B,)
    x_dop: Optional[np.ndarray]  # (B, n_nu) or None
    scale: np.ndarray          # (B,) coefficient scale per spectrum
    weights: np.ndarray        # (B, 2*n_f) final data weights (scaled space)
    rho: np.ndarray            # (B, 3)
    s_vectors: np.ndarray      # (B, 3, N)
    n_iter: np.ndarray         # (B,)
    converged: np.ndarray      # (B,)
    x_raw: np.ndarray          # (B, N) full scaled parameter vector
    dop_rho: Optional[np.ndarray] = None  # (B, 3) DOP derivative strengths
    xmx_norms: Optional[np.ndarray] = None      # (B, 3) it-0 rho normalizers
    dop_xmx_norms: Optional[np.ndarray] = None  # (B, 3)


class BatchedEISFitter:
    """Self-tuning QPHB fits of many EIS spectra on a shared frequency grid.

    Usage:
        fitter = BatchedEISFitter(frequencies, mesh=make_mesh())
        result = fitter.fit(z_batch)           # z_batch: (B, n_freq) complex
    """

    def __init__(self, frequencies, basis_tau=None, tau_supergrid=None,
                 fit_ohmic=True, fit_inductance=True, fit_capacitance=False,
                 fit_dop=False, nonneg=True, dtype=jnp.float64,
                 max_iter=50, xtol=1e-2, qp_max_iter=60, qp_max_iter_warm=None,
                 iw_l1_lambda_0=1e-4, iw_l2_lambda_0=1e-4,
                 mesh=None, pred_stop=False, pred_rtol=1e-2,
                 qp_fused=False, batch_bucket=True, **hyper_kw):
        self.frequencies = np.asarray(frequencies, dtype=float)
        self.dtype = dtype
        self.mesh = mesh
        self.batch_bucket = bool(batch_bucket)
        self.rp_scale = hyper_kw.get("rp_scale", 14.0)

        # Build the shared problem structure with a template DRT fit on a
        # placeholder spectrum (populates basis grid, matrices, special params)
        with host_cpu():
            template = DRT(fixed_basis_tau=basis_tau, tau_supergrid=tau_supergrid,
                           fit_ohmic=fit_ohmic, fit_inductance=fit_inductance,
                           fit_capacitance=fit_capacitance, fit_dop=fit_dop, warn=False)
            z_placeholder = 1.0 + 1.0 / (1 + 2j * np.pi * self.frequencies
                                         / (2 * np.pi * np.median(self.frequencies)))
            template.fit_eis(self.frequencies, z_placeholder, nonneg=nonneg, max_iter=2,
                             iw_l1_lambda_0=iw_l1_lambda_0, iw_l2_lambda_0=iw_l2_lambda_0,
                             **hyper_kw)
        self.template = template
        qp = template.qphb_params

        self.basis_tau = template.basis_tau
        self.cfg: QPHBConfig = qp["cfg"]
        self.num_special = self.cfg.num_special
        self.hypers = qp["hypers"]

        cast = lambda a: jnp.asarray(np.asarray(a), dtype=dtype)
        self.rzm = cast(qp["rm"])
        self.vmm = cast(qp["vmm"])
        self.m_stack = cast(np.stack([qp["penalty_matrices"][f"m{k}"] for k in range(3)]))
        # DOP order-0 smoothing g-matrix: the serial loop applies it in the
        # s-vector update (drt.py:1134-1139); omitting it diverges from the
        # serial path for fit_dop fits
        self.dop_gmat = None
        if self.cfg.fit_dop:
            g0 = np.asarray(template.fit_matrices["gmat0_dop"])
            self.dop_gmat = cast(np.stack(
                [g0 if k == 0 else np.zeros_like(g0) for k in range(3)]))
        self.l1v = cast(qp["l1_lambda_vector"])
        self.lb = cast(qp["lb"])
        self.hyp = jax.tree.map(
            lambda v: v.astype(dtype) if hasattr(v, "astype") else v,
            _hypers_to_pytree(self.hypers))
        iw_hypers = dict(self.hypers)
        iw_hypers["l1_lambda_0"] = iw_l1_lambda_0
        iw_hypers["l2_lambda_0"] = iw_l2_lambda_0
        if "dop_l2_lambda_0" in self.hypers:
            iw_hypers["dop_l2_lambda_0"] = (self.hypers["dop_l2_lambda_0"]
                                            / self.hypers["l2_lambda_0"] * iw_l2_lambda_0)
        self.iw_hyp = jax.tree.map(
            lambda v: v.astype(dtype) if hasattr(v, "astype") else v,
            _hypers_to_pytree(iw_hypers))

        # pred_stop=True adds the opt-in data-space stopping criterion
        # (prediction settled; see fitcore.FitConfig) on top of the
        # reference x-space check — a large throughput lever on batches
        # dominated by benign hyperparameter limit cycles
        if qp_fused and qp_max_iter_warm is None:
            # The fused pallas path only engages on statically-warm CAPPED
            # solves (the cap is its fixed step count); default to the
            # bench-validated cap rather than silently never fusing
            qp_max_iter_warm = 8
        self.fcfg = fitcore.FitConfig(cfg=self.cfg, data_type="eis", num_chrono=0,
                                      vz_offset=False, vz_index=-1, max_iter=max_iter,
                                      x_rtol=xtol, max_hp_iter=1, qp_max_iter=qp_max_iter,
                                      qp_max_iter_warm=qp_max_iter_warm,
                                      pred_stop=bool(pred_stop),
                                      pred_rtol=float(pred_rtol),
                                      qp_fused=bool(qp_fused))

        self._fit_batch = jax.jit(jax.vmap(self._fit_single))

    # ------------------------------------------------------------------
    def _fit_single(self, rzv):
        """One spectrum: init weights (overfit QP) + full QPHB loop."""
        args, _ = _loop_inputs(self, rzv)
        state, _ = fitcore.qphb_fit_loop(*args)
        return state

    def _fit_single_history(self, rzv):
        """Like _fit_single, but records the per-iteration solver state
        (batched qphb_history; reference hybdrt/models/qphb.py:950-966)."""
        args, _ = _loop_inputs(self, rzv)
        state, _, history = fitcore.qphb_fit_scan(*args)
        return state, history

    # ------------------------------------------------------------------
    # Compacted-continuation ("adaptive") scheduling: a vmapped while_loop
    # runs the whole batch until its SLOWEST lane finishes, so lanes that
    # converge early still burn device time. Phase 1 runs the full batch to
    # a small budget, then only the unconverged tail is gathered into a
    # small padded batch and continued — the loop body is Markovian in the
    # solver state, so the trajectory is identical to one uninterrupted run
    # (fitcore.qphb_fit_loop_from_state). Padded tail sizes are quantized so
    # each (shape, budget) pair compiles once.
    def _fit_phase_single(self, rzv, budget):
        """Returns (state, est_weights, pred_history): pred_history is the
        (y_prev, y_prev2) pair the pred_stop settled check carries (None
        when pred_stop is off) — part of the resumable state, so staged
        continuations reproduce the uninterrupted trajectory bitwise."""
        args, est = _loop_inputs(self, rzv,
                                 fcfg=self.fcfg._replace(max_iter=budget))
        if self.fcfg.pred_stop:
            state, _, y_prev, y_prev2 = fitcore.qphb_fit_loop(
                *args, return_pred_history=True)
            return state, est, (y_prev, y_prev2)
        state, _ = fitcore.qphb_fit_loop(*args)
        return state, est, None

    def _cont_single(self, state, est, rzv, stop_at, pred_history=None):
        dtype = rzv.dtype
        dop_gmat = None if self.dop_gmat is None \
            else jnp.asarray(self.dop_gmat, dtype=dtype)
        one = jnp.asarray(1.0, dtype=dtype)
        rzm = self.rzm
        rzm_vz = getattr(self, "rzm_vz", None)
        vz_strength = getattr(self, "vz_strength_vec", None)
        if rzm_vz is None:
            rzm_vz = jnp.zeros_like(rzm)
        if vz_strength is None:
            vz_strength = jnp.ones(rzm.shape[0], dtype=dtype)
        if self.fcfg.data_type == "hybrid" and self.fcfg.vz_offset:
            # The loop carries rzm with its vz-offset column rewritten from
            # the current iterate each iteration (fitcore._loop_body). That
            # column is a pure function of state.x, so the interrupted rzm
            # is reconstructed exactly here instead of materializing a
            # per-lane (M, N) rzm across stage boundaries.
            y_hat = rzm_vz @ state.x
            vz_sep = y_hat.at[self.fcfg.num_chrono:].multiply(-1.0)
            rzm = rzm.at[:, self.fcfg.vz_index].set(vz_sep * vz_strength)
        kw = {}
        if self.fcfg.pred_stop:
            # The settled check's prediction history is resumable state:
            # carrying it across the stage boundary keeps the staged
            # trajectory — including the settling iteration — bitwise
            # identical to the uninterrupted loop
            kw = dict(y_prev0=pred_history[0], y_prev2_0=pred_history[1],
                      return_pred_history=True)
        out = fitcore.qphb_fit_loop_from_state(
            state, rzm, rzv, self.vmm, self.m_stack, dop_gmat, self.l1v,
            self.lb, self.hyp, est, rzm_vz, vz_strength, one, one, one,
            self.fcfg._replace(max_iter=stop_at), **kw)
        if self.fcfg.pred_stop:
            state, _, y_prev, y_prev2 = out
            return state, (y_prev, y_prev2)
        return out[0], None

    # ------------------------------------------------------------------
    # Frame-to-frame warm starting (fit(warm_from=...)): operando /
    # time-series maps re-acquire a whole batch of spectra every frame with
    # parameters drifting slowly, yet a cold fit re-derives the
    # hyperparameter fixed point from scratch each time. Seeding the solver
    # state from the previous frame's converged solutions is the reference's
    # continue-from-init concept (hybdrt/models/drt1d.py:1270
    # _continue_from_init: xmx_norms inherited and held FIXED, weight_factor
    # active from iteration 0, min_iter enforced) applied batched across
    # acquisitions — the outer loop then only tracks the drift instead of
    # re-converging s/rho/weights from their priors.
    def _warm_fcfg(self):
        return self.fcfg._replace(continue_mode=True)

    def _fit_single_warm(self, rzv, x0, s0, rho0, dop_rho0, xmx0, dop_xmx0):
        """One spectrum seeded from a previous frame's converged state.

        Data weights are freshly estimated from THIS frame's data (noise is
        frame-local); only the solver state (x, penalty s/rho, penalty
        norms) carries over. The hybrid vz-offset column is reconstructed
        from the seed iterate exactly as in _cont_single."""
        from ..solver.qphb import QPHBState
        args, _ = _loop_inputs(self, rzv, fcfg=self._warm_fcfg())
        (rzm, rzv_, vmm, m_stack, dop_gmat, l1v, lb, hyp, _x0, _s0, _rho0,
         _dr0, init_w, est_w, out_t, rzm_vz, vz_strength, one, _o2, _o3,
         fcfg) = args
        state0 = QPHBState(
            x=x0, s_vectors=s0, rho_vector=rho0, dop_rho_vector=dop_rho0,
            weights=init_w, outlier_t=out_t,
            xmx_norms=xmx0, dop_xmx_norms=dop_xmx0,
            it=jnp.array(0, dtype=jnp.int32), converged=jnp.array(False),
            qp_dual=jnp.zeros_like(x0))
        if fcfg.data_type == "hybrid" and fcfg.vz_offset:
            y_hat = rzm_vz @ x0
            vz_sep = y_hat.at[fcfg.num_chrono:].multiply(-1.0)
            rzm = rzm.at[:, fcfg.vz_index].set(vz_sep * vz_strength)
        state, _ = fitcore.qphb_fit_loop_from_state(
            state0, rzm, rzv_, vmm, m_stack, dop_gmat, l1v, lb, hyp, est_w,
            rzm_vz, vz_strength, one, one, one, fcfg,
            seed_pred_history=fcfg.pred_stop)
        return state

    def _warm_arrays(self, warm_from, b_orig, scale):
        """Per-lane seed arrays from a previous frame's BatchFitResult,
        rescaled from the old frame's lane scales to the new ones (in-loop
        x is the physical solution divided by the lane scale)."""
        prev_x = np.asarray(warm_from.x_raw)
        if prev_x.shape[0] != b_orig:
            raise ValueError(
                f"warm_from has {prev_x.shape[0]} lanes; this batch has "
                f"{b_orig} (warm seeding is lane-aligned: fit the same "
                f"observations in the same order each frame)")
        ratio = np.asarray(warm_from.scale) / np.asarray(scale)
        return [prev_x * ratio[:, None],
                np.asarray(warm_from.s_vectors),
                np.asarray(warm_from.rho),
                np.asarray(warm_from.dop_rho),
                np.asarray(warm_from.xmx_norms),
                np.asarray(warm_from.dop_xmx_norms)]

    def _dispatch_warm(self, rzv, warm):
        rzv_dev = jnp.asarray(rzv, dtype=self.dtype)
        warm_dev = [jnp.asarray(a, dtype=self.dtype) for a in warm]
        if self.mesh is not None:
            rzv_dev = sh.shard_batch(rzv_dev, self.mesh)
            warm_dev = [sh.shard_batch(a, self.mesh) for a in warm_dev]
        if not hasattr(self, "_fit_batch_warm"):
            self._fit_batch_warm = jax.jit(jax.vmap(self._fit_single_warm))
        return self._fit_batch_warm(rzv_dev, *warm_dev)

    @staticmethod
    def _quantize_tail(n, n_min=32):
        m = n_min
        while m < n:
            m *= 2
        return m

    def _fit_adaptive(self, rzv_np, phase_budgets=(12, 24)):
        """Phased batch fit with tail compaction; returns per-lane states.

        phase_budgets are cumulative iteration checkpoints; after each, the
        still-unconverged lanes are compacted into a quantized-size padded
        batch and continued (final phase runs to fcfg.max_iter)."""
        jits = getattr(self, "_adaptive_jits", None)
        if jits is None:
            jits = self._adaptive_jits = {}

        def phase_fn(budget):
            key = ("phase", budget)
            if key not in jits:
                jits[key] = jax.jit(jax.vmap(
                    lambda rv: self._fit_phase_single(rv, budget)))
            return jits[key]

        def cont_fn(stop_at):
            key = ("cont", stop_at)
            if key not in jits:
                jits[key] = jax.jit(jax.vmap(
                    lambda st, e, rv, p: self._cont_single(st, e, rv,
                                                           stop_at, p)))
            return jits[key]

        max_iter = self.fcfg.max_iter
        budgets = [b for b in phase_budgets if b < max_iter] + [max_iter]

        rzv_dev = jnp.asarray(rzv_np, dtype=self.dtype)
        if self.mesh is not None:
            rzv_dev = sh.shard_batch(rzv_dev, self.mesh)
        states, est, ph = phase_fn(budgets[0])(rzv_dev)

        # All compaction work stays device-resident: only the tiny
        # (converged, it) flags are downloaded each round — with a tunneled
        # chip, pulling the full state pytree to host costs more than the
        # iterations saved.
        n_min = 32 if self.mesh is None \
            else max(32, self.mesh.shape[sh.BATCH_AXIS])
        for stop_at in budgets[1:]:
            conv = np.asarray(states.converged)
            its = np.asarray(states.it)
            active = ~conv & (its < max_iter)
            if not active.any():
                break
            idx = np.where(active)[0]
            m = min(self._quantize_tail(len(idx), n_min), rzv_np.shape[0])
            pad = jnp.asarray(np.concatenate(
                [idx, np.repeat(idx[:1], m - len(idx))]))
            take = lambda a: a[pad] if self.mesh is None \
                else sh.shard_batch(a[pad], self.mesh)
            sub_state = jax.tree.map(take, states)
            out, out_ph = cont_fn(stop_at)(
                sub_state, take(est), take(rzv_dev), jax.tree.map(take, ph))
            k = len(idx)
            idx_dev = jnp.asarray(idx)
            scatter = lambda full, part: full.at[idx_dev].set(part[:k])
            states = jax.tree.map(scatter, states, out)
            ph = jax.tree.map(scatter, ph, out_ph)
        return states

    def _fit_staged(self, rzv_np, phase_budgets=(8, 16), capacities=None,
                    buckets=None):
        """Single-dispatch staged compaction: the adaptive scheduler's
        phase/compact/continue structure executed INSIDE one jitted XLA
        program with static tail capacities.

        The host-driven adaptive path pays one device dispatch plus a
        (converged, it) readback per phase — on a tunneled chip each round
        trip costs more than the iterations it saves (experiments/README.md).
        Here the gather of still-active lanes into a smaller static-shape
        sub-batch (active lanes first via stable argsort), the continuation
        while_loop at reduced width, and the scatter back are all traced into
        the same computation, so the whole schedule costs exactly one
        dispatch. A final full-width continuation to max_iter is the safety
        net for capacity overflow: its while_loop condition is false when
        every lane is converged, so in the common case it costs one
        reduction, not an iteration.

        buckets > 1 splits every stage's gathered lanes into that many
        difficulty-ordered sub-batches (difficulty = how much the lane's
        prediction moved between its last two iterations, the pred_stop
        settled signal): each vmapped continuation runs to the max iteration
        of ITS bucket only, so one slow lane no longer pins the whole stage
        — the straggler tax that made per-spectrum throughput FALL with
        batch size (experiments/batch_scaling.py r4: 1.5x from B=1024 to
        8192). Requires pred_stop (the difficulty signal); the default
        scales with batch size (2 at B<=2048 up to 8 at B>=8192), else 1.

        Per-lane trajectories are identical to the uninterrupted loop (the
        body is Markovian in state; continuing an already-converged lane is
        a no-op, so padding lanes gathered to fill a stage are unchanged;
        bucketing only changes WHICH sub-dispatch a lane runs in). With
        pred_stop the settled check's prediction history is gathered and
        scattered alongside the solver state, so the composition is bitwise
        too (tests/test_parallel.py staged-parity tests run with pred_stop
        both off and on)."""
        b = rzv_np.shape[0]
        max_iter = self.fcfg.max_iter
        budgets = [int(x) for x in phase_budgets if int(x) < max_iter]
        b1 = budgets[0] if budgets else max_iter
        stops = ([*budgets[1:], max_iter] if budgets else [])
        n_dev = 1 if self.mesh is None else int(self.mesh.shape[sh.BATCH_AXIS])
        if capacities is None:
            # Geometric shrink: b//2, b//4, b//8, ... Halving per stage
            # measured best on the bench workload — tighter caps push
            # overflow lanes into the full-width safety net, which costs
            # more than the slack capacity saves (quartering: 5094/s,
            # halving: 6018/s, plain: 3526/s at B=1024 in one session)
            capacities = [b >> (i + 1) for i in range(len(stops))]
        caps = []
        for c in capacities[:len(stops)]:
            c = min(max(int(c), 1), b)
            if n_dev > 1:
                c = min(-(-c // n_dev) * n_dev, b)
            caps.append(c)
        if buckets is None:
            # Scale with batch size: a larger lane pool samples deeper into
            # the iteration distribution's tail at every stage, so it takes
            # more difficulty-ordered splits to keep each sub-dispatch's
            # while_loop near its own members' stopping point. Measured
            # (experiments/batch_scaling.py r5): at B=8192, buckets
            # 1/2/4/8 -> 7392/8436/10362/11243 device spectra/s — buckets=8
            # makes B=8192 flat with B=1024 (the r4 1.5x straggler tax gone)
            buckets = max(2, min(8, b // 1024)) if self.fcfg.pred_stop else 1
        buckets = max(int(buckets), 1)
        if not self.fcfg.pred_stop:
            buckets = 1  # no difficulty signal without the pred history

        jits = getattr(self, "_staged_jits", None)
        if jits is None:
            jits = self._staged_jits = {}
        key = (b, b1, tuple(stops), tuple(caps), buckets, str(self.dtype))
        fn = jits.get(key)
        if fn is None:
            def bucket_widths(cap):
                if buckets == 1 or cap < 2 * max(n_dev, 8):
                    return [cap]
                w = -(-cap // buckets)
                if n_dev > 1:
                    w = -(-w // n_dev) * n_dev
                widths = []
                left = cap
                while left > 0:
                    widths.append(min(w, left))
                    left -= widths[-1]
                return widths

            def staged(rzv):
                states, est, ph = jax.vmap(
                    lambda rv: self._fit_phase_single(rv, b1))(rzv)
                for stop_at, cap in zip(stops, caps):
                    active = ~states.converged
                    # Stable sort of the active flag: active lanes first, in
                    # original order; converged lanes pad the tail (their
                    # continuation is a no-op)
                    idx = jnp.argsort(~active, stable=True)[:cap]
                    widths = bucket_widths(cap)
                    if len(widths) > 1:
                        # Order the stage's lanes easiest-first (converged
                        # pad lanes last) so each bucket's while_loop stops
                        # at its own members' max iteration
                        diff = jnp.sum((ph[0] - ph[1]) ** 2, axis=1)
                        key_d = jnp.where(states.converged, jnp.inf, diff)
                        idx = idx[jnp.argsort(key_d[idx], stable=True)]
                    lo = 0
                    for w in widths:
                        sub_idx = idx[lo:lo + w]
                        lo += w
                        take = lambda a: jnp.take(a, sub_idx, axis=0)
                        sub = jax.tree.map(take, states)
                        out, out_ph = jax.vmap(
                            lambda st, e, rv, p: self._cont_single(
                                st, e, rv, stop_at, p)
                        )(sub, take(est), take(rzv), jax.tree.map(take, ph))
                        scatter = lambda full, part: full.at[sub_idx].set(part)
                        states = jax.tree.map(scatter, states, out)
                        ph = jax.tree.map(scatter, ph, out_ph)
                # Full-width safety net for capacity overflow (free when all
                # lanes are already converged or at max_iter)
                states, _ = jax.vmap(
                    lambda st, e, rv, p: self._cont_single(st, e, rv,
                                                           max_iter, p)
                )(states, est, rzv, ph)
                return states
            fn = jits[key] = jax.jit(staged)

        rzv_dev = jnp.asarray(rzv_np, dtype=self.dtype)
        if self.mesh is not None:
            rzv_dev = sh.shard_batch(rzv_dev, self.mesh)
        return fn(rzv_dev)

    # ------------------------------------------------------------------
    def scale_batch(self, z_batch):
        """Per-spectrum Rp estimate and scaling (reference drtbase.py:439)."""
        z_batch = np.asarray(z_batch)
        rp_est = np.max(z_batch.real, axis=1) - np.min(z_batch.real, axis=1)
        scale = rp_est / self.rp_scale
        z_scaled = z_batch / scale[:, None]
        rzv = np.concatenate([z_scaled.real, z_scaled.imag], axis=1)
        return rzv, scale

    def fit(self, z_batch, return_states=False, adaptive=False,
            phase_budgets=None, return_history=False, staged_capacities=None,
            staged_buckets=None, warm_from=None, collect="full"):
        """Fit a (B, n_freq) batch of complex spectra; returns BatchFitResult.

        warm_from=<previous frame's BatchFitResult> seeds each lane's solver
        state from that frame's converged solution (reference
        continue-from-init semantics, drt1d.py:1270): on slowly-drifting
        time-series/operando maps the outer loop then tracks the drift in a
        few iterations instead of re-converging from the priors. Lanes must
        be the same observations in the same order; results agree with a
        cold fit to solver tolerance (not bitwise — penalty norms are
        inherited from the seed frame rather than re-derived).

        adaptive=True enables compacted-continuation scheduling (see
        _fit_adaptive): numerically identical lane trajectories, but early
        whole-batch dispatch cutoffs with only the unconverged tail
        continued. adaptive="staged" runs the same schedule as ONE jitted
        dispatch with static tail capacities (see _fit_staged) — the right
        mode when per-dispatch latency is significant (tunneled or remote
        chips). Combine either with pred_stop=True for the full throughput
        win: the settled check's prediction history travels with the solver
        state across phase boundaries, so the composition reproduces the
        uninterrupted trajectory (same stop iteration per lane).

        return_history=True appends a per-iteration history dict of arrays
        with shape (B, max_iter, ...) — the batched analog of the
        reference's qphb_history (hybdrt/models/qphb.py:950-966); entries
        past a lane's convergence repeat its converged state (mask with
        history['it']).

        collect="lazy" leaves the solver internals (result.weights,
        result.s_vectors — 80% of the result bytes at bench shapes) on the
        device; np.asarray on either fetches it on demand. Values are
        identical to collect="full" — only the transfer time moves. Use it
        on tunneled/remote chips (~35 MB/s link) when the downstream
        consumer only reads the coefficient fields; keep the default for
        anything that pickles the result (device arrays don't pickle)."""
        if collect not in ("full", "lazy"):
            raise ValueError(f"collect={collect!r}: expected 'full' or "
                             f"'lazy'")
        if adaptive and adaptive not in (True, "staged"):
            raise ValueError(f"adaptive={adaptive!r}: expected False, True "
                             f"(host-driven compaction) or 'staged' "
                             f"(single-dispatch)")
        if adaptive and phase_budgets is not None:
            budgets = [int(x) for x in phase_budgets]
            if budgets != sorted(budgets):
                raise ValueError(
                    f"phase_budgets={tuple(phase_budgets)} must be "
                    f"ascending: each stage continues to a LARGER iteration "
                    f"stop (an out-of-order stop is a no-op silently "
                    f"absorbed by the safety net)")
        if warm_from is not None and (adaptive or return_history):
            raise ValueError("warm_from seeds a plain whole-batch dispatch; "
                             "it cannot be combined with adaptive scheduling "
                             "or return_history")
        z_batch = np.asarray(z_batch)
        rzv, scale = self.scale_batch(z_batch)
        # Cast to the compute dtype BEFORE the host->device transfer: the
        # tunneled chip uploads at ~35 MB/s, so shipping f64 for an f32 fit
        # doubles the upload time (measured 0.28 s vs 0.12 s at B=8192)
        rzv = np.asarray(rzv, dtype=np.dtype(self.dtype))
        b_orig = rzv.shape[0]
        warm = None if warm_from is None \
            else self._warm_arrays(warm_from, b_orig, scale)

        if self.mesh is not None:
            rzv, _ = sh.pad_batch(rzv, self.mesh)
            if warm is not None:
                warm = [sh.pad_batch(a, self.mesh)[0] for a in warm]
        elif self.batch_bucket and b_orig > 1 and not return_history:
            # (the diagnostic history path keeps the exact batch shape:
            # padding changes XLA's shape-dependent rounding, which the
            # iteration-by-iteration serial-parity guarantee can't absorb)
            rzv = _bucket_pad(rzv, b_orig)
            if warm is not None:
                warm = [_bucket_pad(a, b_orig) for a in warm]

        if return_history:
            if adaptive:
                raise ValueError("return_history is a fixed-length scan; "
                                 "use it without adaptive scheduling")
            rzv_dev = jnp.asarray(rzv, dtype=self.dtype)
            if self.mesh is not None:
                rzv_dev = sh.shard_batch(rzv_dev, self.mesh)
            if not hasattr(self, "_fit_batch_history"):
                self._fit_batch_history = jax.jit(
                    jax.vmap(self._fit_single_history))
            states, history = self._fit_batch_history(rzv_dev)
            history = {k: np.asarray(v)[:b_orig] for k, v in history.items()}
            # scan stacks iterations on the leading post-vmap axis -> (B, T, ...)
            result = self.collect(states, scale, b_orig,
                                  return_states=return_states)
            if return_states:
                return (*result, history)
            return result, history

        if warm is not None:
            states = self._dispatch_warm(rzv, warm)
        elif adaptive is True:
            states = self._fit_adaptive(
                rzv, phase_budgets=(12, 24) if phase_budgets is None
                else phase_budgets)
        else:
            # staged default schedule measured best on the bench workload
            # (B=1024, max_iter=50): 3 stages at (8, 14, 22) with halving
            # capacities beat 2-stage (8, 16) and the 4-stage variants
            # (6192/s vs 5635-4301/s in one session; plain 3432/s)
            states = self._dispatch_fit(rzv, adaptive, phase_budgets,
                                        staged_capacities, staged_buckets)
        return self.collect(states, scale, b_orig,
                            return_states=return_states,
                            lazy=(collect == "lazy"))

    def _dispatch_fit(self, rzv, adaptive, phase_budgets, staged_capacities,
                      staged_buckets):
        """Enqueue one batch's fit program (non-blocking); host-prep done."""
        if adaptive == "staged":
            return self._fit_staged(
                rzv, phase_budgets=(8, 14, 22) if phase_budgets is None
                else phase_budgets, capacities=staged_capacities,
                buckets=staged_buckets)
        rzv_dev = jnp.asarray(rzv, dtype=self.dtype)
        if self.mesh is not None:
            rzv_dev = sh.shard_batch(rzv_dev, self.mesh)
        return self._fit_batch(rzv_dev)

    def fit_stream(self, z_batches, adaptive="staged", collect="lazy",
                   phase_budgets=None, staged_capacities=None,
                   staged_buckets=None):
        """Pipelined fits over an iterable of (B, n_freq) complex batches:
        a generator yielding one BatchFitResult per input batch, with the
        host work of consecutive batches software-pipelined against device
        compute (the input-pipeline / double-buffering pattern of the TPU
        ecosystem applied to fit dispatch; no reference analog — the
        reference fits maps strictly serially, hybdrt/mapping/drtmd.py:303).

        Sequential fit() calls serialize upload -> compute -> readback per
        batch; on a tunneled chip transfers are ~20-35% of wall. Here, per
        step: batch N's packed-readback program is enqueued BEFORE batch
        N+1's compute program, so on the device's in-order stream it runs
        immediately after batch N's fit; the host then blocks only on that
        small fetch, and batch N+1 computes on-device while the host
        unpacks, yields, and preps batch N+2.

        Results are identical to sequential fit(..., adaptive=adaptive,
        collect=collect) calls — same compiled programs, same collect
        semantics. Supports adaptive=False | "staged" (host-driven
        adaptive=True needs per-phase readbacks, which would serialize the
        pipeline). Batches may have different sizes (bucketing reuses
        compiled shapes per power-of-two bucket)."""
        if adaptive not in (False, "staged"):
            raise ValueError(f"adaptive={adaptive!r}: fit_stream supports "
                             f"False or 'staged' (host-driven compaction "
                             f"would serialize the pipeline)")
        if collect not in ("full", "lazy"):
            raise ValueError(f"collect={collect!r}: expected 'full' or "
                             f"'lazy'")
        lazy = collect == "lazy"
        lazy_fields = ("weights", "s_vectors") if lazy else ()
        drop = ("qp_dual", "outlier_t")
        prev = None  # (states, scale, b_orig)
        for z_batch in z_batches:
            z_batch = np.asarray(z_batch)
            rzv, scale = self.scale_batch(z_batch)
            rzv = np.asarray(rzv, dtype=np.dtype(self.dtype))
            b_orig = rzv.shape[0]
            if self.mesh is not None:
                rzv, _ = sh.pad_batch(rzv, self.mesh)
            elif self.batch_bucket and b_orig > 1:
                rzv = _bucket_pad(rzv, b_orig)
            enq = None
            if prev is not None:
                enq = _enqueue_pack(prev[0], drop=drop, lazy=lazy_fields)
            states = self._dispatch_fit(rzv, adaptive, phase_budgets,
                                        staged_capacities, staged_buckets)
            if prev is not None:
                fetched = prev[0] if enq is None else _finish_pack(*enq)
                # collect() sees host fields -> no second fetch
                yield self.collect(fetched, prev[1], prev[2], lazy=lazy)
            prev = (states, scale, b_orig)
        if prev is not None:
            yield self.collect(prev[0], prev[1], prev[2], lazy=lazy)

    def collect(self, states, scale, b_orig, return_states=False,
                lazy=False):
        # ONE device->host transfer; the warm-start duals and outlier
        # weights (~1/3 of the packed bytes) are only needed when the
        # caller keeps the raw states. lazy=True additionally defers the
        # big solver internals (weights, s_vectors) as device arrays —
        # np.asarray on them fetches on first use (fit(collect="lazy")).
        lazy_fields = ("weights", "s_vectors") if lazy and not return_states \
            else ()
        states = _fetch_states(
            states, drop=() if return_states else ("qp_dual", "outlier_t"),
            lazy=lazy_fields)
        x_full = np.asarray(states.x)[:b_orig]
        scale = np.asarray(scale)[:b_orig]
        ns = self.num_special
        sp = self.template.special_qp_params

        def special(name, col_scale=1.0):
            if name in sp:
                return x_full[:, sp[name]["index"]] * scale * col_scale
            return np.zeros(b_orig)

        x_dop = None
        if self.cfg.fit_dop:
            ds_, de_ = self.cfg.dop_start, self.cfg.dop_start + self.cfg.dop_size
            x_dop = x_full[:, ds_:de_] * np.asarray(self.template.dop_scale_vector)[None, :] \
                * scale[:, None]

        result = BatchFitResult(
            x=x_full[:, ns:] * scale[:, None],
            r_inf=special("R_inf"),
            inductance=special("inductance", self.template.inductance_scale or 1.0),
            c_inv=special("C_inv", self.template.capacitance_scale or 1.0),
            x_dop=x_dop,
            scale=scale,
            weights=(states.weights[:b_orig] if lazy_fields
                     else np.asarray(states.weights)[:b_orig]),
            rho=np.asarray(states.rho_vector)[:b_orig],
            s_vectors=(states.s_vectors[:b_orig] if lazy_fields
                       else np.asarray(states.s_vectors)[:b_orig]),
            n_iter=np.asarray(states.it)[:b_orig],
            converged=np.asarray(states.converged)[:b_orig],
            x_raw=x_full,
            dop_rho=np.asarray(states.dop_rho_vector)[:b_orig],
            xmx_norms=np.asarray(states.xmx_norms)[:b_orig],
            dop_xmx_norms=np.asarray(states.dop_xmx_norms)[:b_orig],
        )
        if return_states:
            return result, states
        return result

    # ------------------------------------------------------------------
    @on_host
    def param_cov(self, result: BatchFitResult, z_batch, scaled=False,
                  refine_iters=0):
        """Laplace parameter covariance per spectrum: the posterior
        precision P rebuilt (in float64) from each lane's final solver
        state, then inverted (reference drt1d.py:4116-4146 — always
        available from any fit).

        refine_iters > 0 is the float64-refinement fallback for the f32 TPU
        path: each lane's final state is cast to float64 and continued for
        exactly refine_iters outer iterations on the host backend before P
        is rebuilt, washing single-precision drift out of the
        conditioning-sensitive (weights, s, rho) state. For fits parked in
        a benign hyperparameter limit cycle the covariance — like x itself —
        is only defined up to the cycle; refinement makes the f32 and f64
        paths sample it the same way.

        Returns (B, N, N); physical units unless scaled=True (the DRT block
        of the scaled-space covariance is multiplied by scale**2)."""
        from ..models.drt import _hypers_to_pytree
        from ..solver import fitcore
        from ..solver.qphb import QPHBState
        qp = self.template.qphb_params
        k_range = self.cfg.k_range
        m_stack = jnp.asarray(np.stack(
            [np.asarray(qp["penalty_matrices"][f"m{k}"], dtype=float)
             for k in range(k_range)]))
        rzm = jnp.asarray(np.asarray(qp["rm"], dtype=float))
        l1v = jnp.asarray(np.asarray(qp["l1_lambda_vector"], dtype=float))
        hyp = _hypers_to_pytree(self.hypers)
        rzv, scale = self.scale_batch(z_batch)
        cfg = self.cfg

        dop_rho = result.dop_rho if result.dop_rho is not None \
            else np.ones((len(scale), k_range))
        rho64 = np.asarray(result.rho, dtype=float)
        s64 = np.asarray(result.s_vectors, dtype=float)
        w64 = np.asarray(result.weights, dtype=float)
        dr64 = np.asarray(dop_rho, dtype=float)
        rzv64 = np.asarray(rzv, dtype=float)

        if refine_iters > 0:
            x64 = np.asarray(result.x_raw, dtype=float)
            vmm64 = jnp.asarray(np.asarray(qp["vmm"], dtype=float))
            lb64 = jnp.asarray(np.asarray(qp["lb"], dtype=float))
            xmx = np.asarray(
                result.xmx_norms if result.xmx_norms is not None
                else np.ones((len(scale), k_range)), dtype=float)
            dop_xmx = np.asarray(
                result.dop_xmx_norms if result.dop_xmx_norms is not None
                else np.ones((len(scale), k_range)), dtype=float)
            fcfg = self.fcfg._replace(
                max_iter=1 + refine_iters, continue_mode=True,
                min_iter=1 + refine_iters, pred_stop=False,
                qp_max_iter_warm=None)

            def cont(x, s, rho, dr, w, rv, xn, dxn):
                st = QPHBState(
                    x=x, s_vectors=s, rho_vector=rho, dop_rho_vector=dr,
                    weights=w, outlier_t=jnp.ones_like(rv),
                    xmx_norms=xn, dop_xmx_norms=dxn,
                    it=jnp.array(1, dtype=jnp.int32),
                    converged=jnp.array(False), qp_dual=jnp.zeros_like(x))
                # Undamped weight re-estimation during refinement (the same
                # choice the serial pfrt record_step makes): anchor to the
                # current weights
                st_out, _ = fitcore.qphb_fit_loop_from_state(
                    st, rzm, rv, vmm64, m_stack, None, l1v, lb64, hyp,
                    w, jnp.zeros_like(rzm), jnp.ones(rzm.shape[0]),
                    jnp.asarray(1.0), jnp.asarray(1.0), jnp.asarray(1.0),
                    fcfg)
                return (st_out.rho_vector, st_out.dop_rho_vector,
                        st_out.s_vectors, st_out.weights)

            key = ("cov_refine", refine_iters)
            jits = getattr(self, "_cov_jits", None)
            if jits is None:
                jits = self._cov_jits = {}
            if key not in jits:
                jits[key] = jax.jit(jax.vmap(cont))
            rho_r, dr_r, s_r, w_r = jits[key](
                jnp.asarray(x64), jnp.asarray(s64), jnp.asarray(rho64),
                jnp.asarray(dr64), jnp.asarray(w64), jnp.asarray(rzv64),
                jnp.asarray(xmx), jnp.asarray(dop_xmx))
            rho64, dr64 = np.asarray(rho_r), np.asarray(dr_r)
            s64, w64 = np.asarray(s_r), np.asarray(w_r)

        def one(rv, rho, dop_rho_v, s, w):
            p, _ = qphb_mod.calculate_pq(rzm, rv, m_stack, hyp, l1v, rho,
                                         dop_rho_v, s, w, cfg)
            return p

        p_all = jax.vmap(one)(
            jnp.asarray(rzv64), jnp.asarray(rho64), jnp.asarray(dr64),
            jnp.asarray(s64), jnp.asarray(w64))
        cov = np.linalg.inv(np.asarray(p_all))
        if not scaled:
            # Physical units: per-lane scale vector with the same special-
            # column factors as DRT.estimate_param_cov (models/drt.py:2098)
            t = self.template
            col = np.ones(cov.shape[-1])
            for name, info in t.special_qp_params.items():
                s0, s1 = t.get_special_indices(name)
                if name == "inductance":
                    col[s0:s1] = t.inductance_scale
                elif name == "C_inv":
                    col[s0:s1] = t.capacitance_scale
                elif name == "x_dop":
                    col[s0:s1] = np.asarray(t.dop_scale_vector)
            sv = np.asarray(scale, dtype=float)[:, None] * col[None, :]
            cov = cov * sv[:, :, None] * sv[:, None, :]
        return cov

    # ------------------------------------------------------------------
    def predict_r_p(self, result: BatchFitResult):
        from ..ops import basis as basis_mod
        area = basis_mod.get_basis_func_area(self.template.tau_basis_type,
                                             self.template.tau_epsilon,
                                             self.template.zga_params)
        return np.sum(np.abs(result.x), axis=1) * area

    @on_host
    def predict_z(self, result: BatchFitResult, frequencies=None):
        """Batched impedance prediction from fitted parameters."""
        from ..ops import mat1d
        if frequencies is None:
            frequencies = self.frequencies
        t = self.template
        zm = np.asarray(mat1d.construct_impedance_matrix(
            frequencies, "real", tau=self.basis_tau, basis_type=t.tau_basis_type,
            epsilon=t.tau_epsilon, integrate_method=t.integrate_method,
            interpolate_grids=t.interpolate_lookups["z_real"])) \
            + 1j * np.asarray(mat1d.construct_impedance_matrix(
                frequencies, "imag", tau=self.basis_tau, basis_type=t.tau_basis_type,
                epsilon=t.tau_epsilon, integrate_method=t.integrate_method,
                interpolate_grids=t.interpolate_lookups["z_imag"]))
        z = result.x @ zm.T
        z = z + result.r_inf[:, None]
        z = z + result.inductance[:, None] * 2j * np.pi * frequencies[None, :]
        if self.cfg.fit_dop and result.x_dop is not None:
            from ..ops import phasance
            zm_dop = np.asarray(phasance.construct_phasor_z_matrix(
                frequencies, t.basis_nu, t.nu_basis_type, t.nu_epsilon))
            z = z + result.x_dop @ zm_dop.T
        return z


class BatchedHybridFitter:
    """Self-tuning QPHB fits of many hybrid (chrono + EIS) observations that
    share a measurement protocol: one time grid, one step sequence, one
    frequency grid — the DRT mapping acquisition pattern. The design,
    penalty, variance, and vz-offset structures are built once from a
    template fit and the per-spectrum loop (weight init + full outer loop,
    including the per-iteration vz-offset column rewrite) is vmapped over the
    batch and sharded over devices. The reference fits these serially
    (reference drtmd.py:303-319); it has no batched hybrid path at all.

    Usage:
        fitter = BatchedHybridFitter(times, i_signal, freq, step_times=...)
        result = fitter.fit(v_batch, z_batch)
    """

    def __init__(self, times, i_signal, frequencies, step_times=None,
                 step_sizes=None, basis_tau=None, tau_supergrid=None,
                 fit_ohmic=True, fit_inductance=True, nonneg=True,
                 vz_offset=True, dtype=jnp.float64, max_iter=50, xtol=1e-2,
                 qp_max_iter=60, qp_max_iter_warm=None, mesh=None,
                 pred_stop=False, pred_rtol=1e-2, qp_fused=False,
                 batch_bucket=True, **hyper_kw):
        self.times = np.asarray(times, dtype=float)
        self.i_signal = np.asarray(i_signal, dtype=float)
        self.frequencies = np.asarray(frequencies, dtype=float)
        self.dtype = dtype
        self.mesh = mesh
        self.batch_bucket = bool(batch_bucket)
        self.rp_scale = hyper_kw.get("rp_scale", 14.0)

        with host_cpu():
            template = DRT(fixed_basis_tau=basis_tau, tau_supergrid=tau_supergrid,
                           fit_ohmic=fit_ohmic, fit_inductance=fit_inductance,
                           warn=False)
            # Placeholder response consistent with the input protocol
            z_ph = 1.0 + 1.0 / (1 + 2j * np.pi * self.frequencies
                                / (2 * np.pi * np.median(self.frequencies)))
            from .. import preprocessing as pp_mod
            if step_times is None or step_sizes is None:
                step_times, step_sizes = pp_mod.get_step_info(self.times, self.i_signal)
            v_ph = 0.0
            for st, sa in zip(np.atleast_1d(step_times), np.atleast_1d(step_sizes)):
                v_ph = v_ph + sa * 2.0 * (1 - np.exp(-np.maximum(self.times - st, 0)
                                                     / 1e-3)) * (self.times >= st)
            template.fit_hybrid(self.times, self.i_signal, v_ph, self.frequencies,
                                z_ph, step_times=np.atleast_1d(step_times),
                                step_sizes=np.atleast_1d(step_sizes),
                                nonneg=nonneg, vz_offset=vz_offset, max_iter=2,
                                **hyper_kw)
        self.template = template
        self.step_times = np.atleast_1d(step_times)
        self.step_sizes = np.atleast_1d(step_sizes)
        qp = template.qphb_params

        self.basis_tau = template.basis_tau
        self.cfg: QPHBConfig = qp["cfg"]
        self.num_special = self.cfg.num_special
        self.num_chrono = qp["num_chrono"]
        self.hypers = qp["hypers"]
        self.input_signal_scale = template.input_signal_scale

        cast = lambda a: jnp.asarray(np.asarray(a), dtype=dtype)
        rzm = np.array(qp["rm"], dtype=float)
        # The stored rzm carries the template's final vz-offset column;
        # a fresh system starts with it zeroed (the loop rewrites it from
        # the current prediction each iteration)
        if "vz_offset" in template.special_qp_params:
            self.vz_index = template.special_qp_params["vz_offset"]["index"]
            rzm[:, self.vz_index] = 0.0
            rzm_vz = rzm.copy()
            vb0, vb1 = template.get_special_indices("v_baseline")
            rzm_vz[:, vb0:vb1] = 0.0
            self.vz_offset = True
        else:
            self.vz_index = -1
            rzm_vz = np.zeros_like(rzm)
            self.vz_offset = False
        self.rzm = cast(rzm)
        self.rzm_vz = cast(rzm_vz)
        self.vz_strength_vec = cast(qp["vz_strength_vec"]
                                    if np.ndim(qp["vz_strength_vec"])
                                    else np.ones(rzm.shape[0]))
        self.vmm = cast(qp["vmm"])
        self.m_stack = cast(np.stack([qp["penalty_matrices"][f"m{k}"] for k in range(3)]))
        self.dop_gmat = None  # hybrid fitter does not support fit_dop
        self.l1v = cast(qp["l1_lambda_vector"])
        self.lb = cast(qp["lb"])
        self.hyp = jax.tree.map(
            lambda v: v.astype(dtype) if hasattr(v, "astype") else v,
            _hypers_to_pytree(self.hypers))
        iw_hypers = dict(self.hypers)
        iw_hypers["l1_lambda_0"] = 1e-4
        iw_hypers["l2_lambda_0"] = 1e-4
        self.iw_hyp = jax.tree.map(
            lambda v: v.astype(dtype) if hasattr(v, "astype") else v,
            _hypers_to_pytree(iw_hypers))

        if qp_fused and qp_max_iter_warm is None:
            # See BatchedEISFitter: the fused path needs the warm cap as its
            # fixed step count; default it rather than silently never fusing
            qp_max_iter_warm = 8
        self.fcfg = fitcore.FitConfig(
            cfg=self.cfg, data_type="hybrid", num_chrono=self.num_chrono,
            vz_offset=self.vz_offset, vz_index=self.vz_index,
            max_iter=max_iter, x_rtol=xtol, max_hp_iter=1,
            qp_max_iter=qp_max_iter, qp_max_iter_warm=qp_max_iter_warm,
            pred_stop=bool(pred_stop), pred_rtol=float(pred_rtol),
            qp_fused=bool(qp_fused))

        self._fit_batch = jax.jit(jax.vmap(self._fit_single))

    # ------------------------------------------------------------------
    def _fit_single(self, rzv):
        args, _ = _loop_inputs(self, rzv)
        state, _ = fitcore.qphb_fit_loop(*args)
        return state

    # ------------------------------------------------------------------
    def scale_batch(self, v_batch, z_batch):
        """Per-observation Rp scaling and baseline offsets; returns the scaled
        stacked data vectors plus the coefficient scales."""
        from .. import preprocessing as pp_mod
        v_batch = np.asarray(v_batch, dtype=float)
        z_batch = np.asarray(z_batch)
        b = v_batch.shape[0]
        rzv = np.zeros((b, self.num_chrono + 2 * z_batch.shape[1]))
        scale = np.zeros(b)
        pre = self.times < self.step_times[0]
        for i in range(b):
            rp_est = pp_mod.estimate_rp(self.times, self.step_times,
                                        self.step_sizes, v_batch[i],
                                        self.template.step_model, z_batch[i])
            scale[i] = rp_est / self.rp_scale
            resp_scale = self.input_signal_scale * scale[i]
            v_s = v_batch[i] / resp_scale
            # No pre-step samples (first sample at/after the step): skip the
            # baseline subtraction instead of taking a NaN median
            if pre.any():
                v_s = v_s - np.median(v_s[pre])
            z_s = z_batch[i] / scale[i]
            rzv[i] = np.concatenate([v_s, z_s.real, z_s.imag])
        return rzv, scale

    def _fit_single_history(self, rzv):
        """Per-iteration history variant (batched qphb_history)."""
        args, _ = _loop_inputs(self, rzv)
        state, _, history = fitcore.qphb_fit_scan(*args)
        return state, history

    def fit(self, v_batch, z_batch, return_states=False, return_history=False,
            adaptive=False, phase_budgets=None, staged_capacities=None,
            staged_buckets=None, warm_from=None, collect="full"):
        """Fit (B, n_times) responses + (B, n_freq) spectra; returns
        BatchFitResult (x in physical units). return_history=True appends a
        (B, max_iter, ...) per-iteration history dict (batched analog of
        the reference's qphb_history, hybdrt/models/qphb.py:950-966).
        collect="lazy" defers result.weights/result.s_vectors as device
        arrays (see the EIS fit docstring).

        adaptive=True / adaptive="staged" enable the compacted-continuation
        schedulers shared with BatchedEISFitter (see its fit docstring); the
        hybrid continuation reconstructs the in-loop vz-offset column from
        the resumed iterate, so lane trajectories stay identical to the
        uninterrupted loop. warm_from=<previous frame's BatchFitResult>
        seeds each lane from that frame's converged solution (see the EIS
        fit docstring; the vz-offset column is rebuilt from the seed)."""
        if collect not in ("full", "lazy"):
            raise ValueError(f"collect={collect!r}: expected 'full' or "
                             f"'lazy'")
        if adaptive and adaptive not in (True, "staged"):
            raise ValueError(f"adaptive={adaptive!r}: expected False, True "
                             f"(host-driven compaction) or 'staged' "
                             f"(single-dispatch)")
        if adaptive and phase_budgets is not None:
            budgets = [int(x) for x in phase_budgets]
            if budgets != sorted(budgets):
                raise ValueError(
                    f"phase_budgets={tuple(phase_budgets)} must be "
                    f"ascending: each stage continues to a LARGER iteration "
                    f"stop (an out-of-order stop is a no-op silently "
                    f"absorbed by the safety net)")
        if warm_from is not None and (adaptive or return_history):
            raise ValueError("warm_from seeds a plain whole-batch dispatch; "
                             "it cannot be combined with adaptive scheduling "
                             "or return_history")
        rzv, scale = self.scale_batch(v_batch, z_batch)
        rzv = np.asarray(rzv, dtype=np.dtype(self.dtype))
        b_orig = rzv.shape[0]
        if return_history and adaptive:
            raise ValueError("return_history is a fixed-length scan; "
                             "use it without adaptive scheduling")
        warm = None if warm_from is None \
            else self._warm_arrays(warm_from, b_orig, scale)
        if self.mesh is not None:
            rzv, _ = sh.pad_batch(rzv, self.mesh)
            if warm is not None:
                warm = [sh.pad_batch(a, self.mesh)[0] for a in warm]
        elif self.batch_bucket and b_orig > 1 and not return_history:
            rzv = _bucket_pad(rzv, b_orig)
            if warm is not None:
                warm = [_bucket_pad(a, b_orig) for a in warm]
        if return_history:
            rzv_dev = jnp.asarray(rzv, dtype=self.dtype)
            if self.mesh is not None:
                rzv_dev = sh.shard_batch(rzv_dev, self.mesh)
            if not hasattr(self, "_fit_batch_history"):
                self._fit_batch_history = jax.jit(
                    jax.vmap(self._fit_single_history))
            states, history = self._fit_batch_history(rzv_dev)
            history = {k: np.asarray(v)[:b_orig] for k, v in history.items()}
            result = BatchedEISFitter.collect(self, states, scale, b_orig,
                                              return_states=return_states)
            if return_states:
                return (*result, history)
            return result, history
        if warm is not None:
            states = self._dispatch_warm(rzv, warm)
        elif adaptive == "staged":
            states = self._fit_staged(
                rzv, phase_budgets=(8, 14, 22) if phase_budgets is None
                else phase_budgets, capacities=staged_capacities,
                buckets=staged_buckets)
        elif adaptive:
            states = self._fit_adaptive(
                rzv, phase_budgets=(12, 24) if phase_budgets is None
                else phase_budgets)
        else:
            rzv_dev = jnp.asarray(rzv, dtype=self.dtype)
            if self.mesh is not None:
                rzv_dev = sh.shard_batch(rzv_dev, self.mesh)
            states = self._fit_batch(rzv_dev)
        return BatchedEISFitter.collect(self, states, scale, b_orig,
                                        return_states=return_states,
                                        lazy=(collect == "lazy"))

    # Reuse the EIS fitter's physical-units extraction, Rp helper, and the
    # compacted-continuation schedulers (the continuation body is shared;
    # _cont_single reconstructs the hybrid vz-offset column from state)
    collect = BatchedEISFitter.collect
    predict_r_p = BatchedEISFitter.predict_r_p
    _fit_phase_single = BatchedEISFitter._fit_phase_single
    _cont_single = BatchedEISFitter._cont_single
    _quantize_tail = staticmethod(BatchedEISFitter._quantize_tail)
    _fit_adaptive = BatchedEISFitter._fit_adaptive
    _fit_staged = BatchedEISFitter._fit_staged
    # frame-to-frame warm starting (_fit_single_warm reconstructs the
    # hybrid vz-offset column from the seed iterate)
    _warm_fcfg = BatchedEISFitter._warm_fcfg
    _fit_single_warm = BatchedEISFitter._fit_single_warm
    _warm_arrays = BatchedEISFitter._warm_arrays
    _dispatch_warm = BatchedEISFitter._dispatch_warm


def _pfrt_sweep_single(fitter, rzv, factors, max_init_iter, max_iter_per_step,
                       dtype):
    """Init fit at factors[0] + lax.scan continuation over the remaining
    regularization factors for ONE spectrum (vmapped by the caller).
    Returns (step_x, step_llh) with leading factor axis."""
    cfg = fitter.cfg
    n = fitter.rzm.shape[1]
    base_hyp = fitter.hyp

    def hyp_at(s0_k, l2_k):
        h = dict(base_hyp)
        h["s_0"] = s0_k
        h["l2_lambda_0"] = l2_k
        return h

    s0_base = jnp.asarray(base_hyp["s_0"], dtype=dtype)
    l2_base = jnp.asarray(base_hyp["l2_lambda_0"], dtype=dtype)
    f = jnp.asarray(factors, dtype=dtype)
    s0_steps = s0_base[None, :] * f[:, None]
    l2_steps = l2_base / f

    rho0 = jnp.asarray(fitter.hypers["rho_0"], dtype=dtype)
    dop_rho0 = jnp.ones(3, dtype=dtype)
    s_vec0 = jnp.stack([jnp.full(n, 1.0, dtype=dtype) * s0_steps[0, i]
                        for i in range(3)])
    est, init_w, _, out_t = qphb_mod.initialize_weights(
        fitter.iw_hyp, fitter.m_stack, rho0, dop_rho0, s_vec0, rzv,
        fitter.rzm, fitter.vmm, fitter.lb, cfg, outlier_p=None)

    fcfg_init = fitter.fcfg._replace(max_iter=max_init_iter)
    x0 = jnp.full(n, 1e-6, dtype=dtype)
    ones_row = jnp.ones(fitter.rzm.shape[0], dtype=dtype)
    one = jnp.asarray(1.0, dtype=dtype)
    dop_gmat = None if getattr(fitter, "dop_gmat", None) is None \
        else jnp.asarray(fitter.dop_gmat, dtype=dtype)
    state, _ = fitcore.qphb_fit_loop(
        fitter.rzm, rzv, fitter.vmm, fitter.m_stack, dop_gmat, fitter.l1v,
        fitter.lb, hyp_at(s0_steps[0], l2_steps[0]),
        x0, s_vec0, rho0, dop_rho0, init_w, est, out_t,
        jnp.zeros_like(fitter.rzm), ones_row, one, one, one, fcfg_init)

    def llh_of(x):
        w, _, _ = qphb_mod.estimate_weights(x, rzv, fitter.vmm, fitter.rzm)
        return qphb_mod.evaluate_llh(x, fitter.rzm, rzv, w,
                                     marginalize_weights=True)

    # pred_stop is disabled for the short warm-continued steps (the manual
    # while_loop here carries no prediction history)
    fcfg_cont = fitter.fcfg._replace(max_iter=max_iter_per_step,
                                     continue_mode=True, min_iter=2,
                                     pred_stop=False)

    def step(state, inputs):
        s0_k, l2_k = inputs
        hyp_k = hyp_at(s0_k, l2_k)
        st = state._replace(it=jnp.array(0, dtype=jnp.int32),
                            converged=jnp.array(False))
        carry = fitcore.FitCarry(state=st, rzm=fitter.rzm)

        def cond(c):
            return (c.state.it < fcfg_cont.max_iter) & (~c.state.converged)

        def body(c):
            return fitcore._loop_body(
                c, rzv, fitter.vmm, fitter.m_stack, None, fitter.l1v,
                fitter.lb, est, jnp.zeros_like(fitter.rzm), ones_row,
                one, one, one, hyp_k, fcfg_cont)

        final = jax.lax.while_loop(cond, body, carry)
        st = final.state
        return st, (st.x, llh_of(st.x), st.rho_vector, st.s_vectors,
                    st.dop_rho_vector)

    _, (xs, llhs, rhos, svs, dop_rhos) = jax.lax.scan(
        step, state, (s0_steps[1:], l2_steps[1:]))
    step_x = jnp.concatenate([state.x[None], xs])
    step_llh = jnp.concatenate([llh_of(state.x)[None], llhs])
    # Per-step hyperparameter state: needed to rebuild the per-step posterior
    # precision P on demand (covariance for batched-pfrt observations,
    # reference drt1d.py:4116-4146 always has P available)
    step_rho = jnp.concatenate([state.rho_vector[None], rhos])
    step_s = jnp.concatenate([state.s_vectors[None], svs])
    step_dop_rho = jnp.concatenate([state.dop_rho_vector[None], dop_rhos])
    return step_x, step_llh, step_rho, step_s, step_dop_rho


def _pfrt_fit(self, z_batch, factors=None, max_init_iter=20,
              max_iter_per_step=10, return_step_state=False):
    """PFRT regularization sweep over the whole batch: the init fit and the
    warm-continued factor sweep run inside ONE vmapped XLA computation (the
    reference sweeps factors per spectrum in python,
    reference drt1d.py:2558-2714).

    Returns (step_x_raw, step_llh, scale): step_x_raw is (B, n_factors, N)
    raw (scaled-space) solutions; multiply the DRT block by scale to get
    physical coefficients. With return_step_state=True a fourth element is
    appended: {"rho": (B,F,3), "s_vectors": (B,F,3,N), "dop_rho": (B,F,3)},
    the per-factor hyperparameter state needed to rebuild each step's
    posterior precision P (covariance on demand)."""
    if factors is None:
        factors = np.logspace(-0.7, 0.7, 11)
    factors = np.asarray(factors, dtype=float)
    rzv, scale = self.scale_batch(z_batch)
    b_orig = rzv.shape[0]
    if self.mesh is not None:
        rzv, _ = sh.pad_batch(rzv, self.mesh)
        rzv_dev = sh.shard_batch(jnp.asarray(rzv, dtype=self.dtype), self.mesh)
    else:
        if self.batch_bucket and b_orig > 1:
            rzv = _bucket_pad(rzv, b_orig)
        rzv_dev = jnp.asarray(rzv, dtype=self.dtype)

    # Cache the jitted sweep per configuration (a fresh jit wrapper per call
    # would retrace and recompile every time)
    sweep_key = (factors.tobytes(), max_init_iter, max_iter_per_step)
    cache = getattr(self, "_pfrt_sweeps", None)
    if cache is None:
        cache = self._pfrt_sweeps = {}
    sweep = cache.get(sweep_key)
    if sweep is None:
        sweep = jax.jit(jax.vmap(lambda rv: _pfrt_sweep_single(
            self, rv, factors, max_init_iter, max_iter_per_step, self.dtype)))
        cache[sweep_key] = sweep
    step_x, step_llh, step_rho, step_s, step_dop_rho = sweep(rzv_dev)
    out = (np.asarray(step_x)[:b_orig], np.asarray(step_llh)[:b_orig],
           np.asarray(scale))
    if return_step_state:
        out = out + ({"rho": np.asarray(step_rho)[:b_orig],
                      "s_vectors": np.asarray(step_s)[:b_orig],
                      "dop_rho": np.asarray(step_dop_rho)[:b_orig]},)
    return out


BatchedEISFitter.pfrt_fit = _pfrt_fit
