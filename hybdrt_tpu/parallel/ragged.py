"""Ragged-observation batching: heterogeneous spectra as one masked computation.

The mapping workload is heterogeneous by construction: each observation has
its own frequency grid, chrono protocol, and data-informed basis window on the
shared tau supergrid (reference hybdrt/mapping/drtmd.py:245-319 fits them
serially). Here every observation's QP system is assembled EXACTLY as the
serial fit would (via DRT._qphb_fit_core(prep_only=True)), then padded into
one rectangular batch and fitted as a single vmapped, mesh-shardable XLA
computation:

  * data rows are padded to the batch max; padded rows have zero design rows,
    zero data, and zero variance-matrix rows, so they drop out of the weighted
    QP, the vmm-filtered weight estimation, and the likelihood (the vmm row
    normalization is computed per observation BEFORE padding, so padded rows
    never dilute it — SURVEY hard part 3);
  * basis windows are padded to the widest window; the penalty matrices on a
    log-uniform supergrid are translation-invariant (Toeplitz), so one shared
    penalty stack serves every window and padded parameter columns are pinned
    to exactly zero by the masked l2 assembly (qphb.calculate_qp_l2_matrix);
  * per-observation row structure (chrono/EIS split, vz-offset sign and
    strength, weight factors) rides along as data vectors instead of static
    shapes.

Result: DRTMD maps with mixed grids/protocols run at batched-TPU speed while
matching the serial per-observation fits.
"""
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..solver import fitcore, qphb as qphb_mod
from ..models.drt import DRT, _hypers_to_pytree
from ..utils.array import nearest_index
from ..utils.device import host_cpu
from . import sharding as sh


class RaggedFitResult(NamedTuple):
    """Physical-units results (leading axis = batch)."""
    x: np.ndarray               # (B, W_max) DRT coefficients (see tau_indices)
    tau_indices: list           # per-obs (left, right) window on the supergrid
    r_inf: np.ndarray
    inductance: np.ndarray
    c_inv: np.ndarray
    x_dop: Optional[np.ndarray]
    scale: np.ndarray           # (B,) coefficient scale
    weights: np.ndarray         # (B, R_max) final data weights (scaled space)
    rho: np.ndarray
    s_vectors: np.ndarray
    n_iter: np.ndarray
    converged: np.ndarray
    x_raw: np.ndarray           # (B, N_max) scaled parameter vectors
    num_rows: np.ndarray        # (B,) real data rows per obs
    num_chrono: np.ndarray      # (B,) chrono rows per obs


def _check_consistent(systems):
    """All observations must share the QP layout (same special params/config)."""
    ref = systems[0]
    for s in systems[1:]:
        if s["cfg"] != ref["cfg"]:
            raise ValueError("Ragged batch requires identical QPHB config "
                             f"across observations; got {s['cfg']} vs {ref['cfg']}")
        if list(s["special_qp_params"]) != list(ref["special_qp_params"]):
            raise ValueError("Ragged batch requires identical special-parameter "
                             "layout across observations")
        if s["data_type"] != ref["data_type"]:
            raise ValueError("Ragged batch requires one data type per batch; "
                             "partition mixed observations by type first")


class BatchedRaggedFitter:
    """Self-tuning QPHB fits of heterogeneous observations (per-observation
    frequency grids, chrono protocols, and basis windows) as one vmapped,
    mesh-shardable computation.

    Usage:
        fitter = BatchedRaggedFitter(tau_supergrid, mesh=make_mesh())
        result = fitter.fit(observations)
    where each observation is ((times, i_signal, v_signal) | None, (freq, z) | None).
    """

    def __init__(self, tau_supergrid, fit_ohmic=True, fit_inductance=True,
                 fit_capacitance=False, fit_dop=False, nonneg=True,
                 dtype=jnp.float64, max_iter=50, xtol=1e-2, qp_max_iter=60,
                 qp_max_iter_warm=None, mesh=None, step_model="ideal",
                 chrono_mode="galv", fixed_basis_nu=None, fit_kw=None,
                 per_obs_penalty=True, pred_stop=False, pred_rtol=1e-2,
                 qp_fused=False, batch_bucket=True, **hyper_kw):
        self.tau_supergrid = np.asarray(tau_supergrid, dtype=float)
        self.dtype = dtype
        self.mesh = mesh
        self.nonneg = nonneg
        self.max_iter = max_iter
        self.xtol = xtol
        self.qp_max_iter = qp_max_iter
        self.qp_max_iter_warm = qp_max_iter_warm
        self.pred_stop = bool(pred_stop)
        self.pred_rtol = float(pred_rtol)
        self.qp_fused = bool(qp_fused)
        if self.qp_fused and self.qp_max_iter_warm is None:
            # See BatchedEISFitter: the fused path needs the warm cap as its
            # fixed step count; default it rather than silently never fusing
            self.qp_max_iter_warm = 8
        # Pad the batch axis to the next power of two (repeating obs 0) so
        # incremental workloads reuse compiled shapes; see fit()
        self.batch_bucket = bool(batch_bucket)
        self.fit_kw = dict(fit_kw or {})
        self.hyper_kw = hyper_kw
        # per_obs_penalty=True carries each observation's own penalty stack
        # (B,3,N,N) for bit-exact parity with serial fits; False shares the
        # widest window's Toeplitz stack (mathematically identical on the
        # log-uniform supergrid, but differing in the last ulp — the
        # ill-conditioned QP's active-set selection can amplify that seed to
        # ~1e-4 over the outer loop). Use False only if penalty memory is the
        # bottleneck.
        self.per_obs_penalty = per_obs_penalty
        self._drt_kw = dict(
            tau_supergrid=self.tau_supergrid, fit_ohmic=fit_ohmic,
            fit_inductance=fit_inductance, fit_capacitance=fit_capacitance,
            fit_dop=fit_dop, fixed_basis_nu=fixed_basis_nu,
            step_model=step_model, chrono_mode=chrono_mode, warn=False)
        # One template carries the (expensive) interpolation lookups; per-obs
        # prep instances share them
        with host_cpu():
            self.template = DRT(**self._drt_kw)

    # ------------------------------------------------------------------
    # Fit kwargs that make the QP system matrices or scaling depend on the
    # DATA (not just the measurement protocol); their presence disables the
    # shared-system fast path below
    _DATA_DEPENDENT_KW = frozenset({
        "solve_rp", "remove_extremes", "remove_outliers",
        "return_outlier_index", "scale_data", "update_scale",
        "subtract_background", "series_neg"})

    def _fast_path_ok(self):
        return not (self._DATA_DEPENDENT_KW & set(self.fit_kw))

    def _prep_obs(self, chrono_data, eis_data):
        """Assemble one observation's QP system exactly as the serial fit
        would (DRT._qphb_fit_core(prep_only=True)).

        Two levels of reuse across observations sharing a measurement
        protocol (grids + input signal):
          * one DRT instance per protocol — its assembly caches make repeat
            preps skip all matrix construction;
          * for EIS observations (without data-dependent fit kwargs), the
            whole prep-only system is cached per protocol and later
            observations only redo the data scaling (rzv, coefficient
            scale), skipping the serial prep path entirely. This removes
            the per-observation host bottleneck of large heterogeneous maps
            (the reference re-preps every observation serially,
            reference hybdrt/mapping/drtmd.py:303-319).
        """
        times, i_sig, v_sig = (chrono_data if chrono_data is not None
                               and chrono_data[0] is not None
                               else (None, None, None))
        freq, z = (eis_data if eis_data is not None
                   and eis_data[0] is not None else (None, None))
        key = (None if times is None else np.asarray(times).tobytes(),
               None if i_sig is None else np.asarray(i_sig).tobytes(),
               None if freq is None else np.asarray(freq).tobytes())
        if not hasattr(self, "_drt_cache"):
            self._drt_cache = {}
            self._sys_cache = {}

        # Shared-protocol fast paths: the cached prep-only system + a
        # per-observation data rescale, skipping the serial prep entirely.
        # EIS parity: scale_data computes coefficient_scale = estimate_rp /
        # rp_scale and divides z by it (models/drt.py:345-391); nothing else
        # in the prep-only system depends on z. Hybrid parity: see
        # _hybrid_rescale.
        tmpl = self._sys_cache.get(key)
        if tmpl is not None:
            if tmpl["data_type"] == "hybrid":
                return self._hybrid_rescale(tmpl, times, v_sig, z)
            from .. import preprocessing as pp_mod
            z = np.asarray(z, dtype=complex)
            rp_est = pp_mod.estimate_rp(None, None, None, None, None, z)
            scale = rp_est / tmpl["hypers"]["rp_scale"]
            z_scaled = z / scale
            sys_ = dict(tmpl)
            sys_["rzv"] = np.concatenate([z_scaled.real, z_scaled.imag])
            sys_["coefficient_scale"] = scale
            sys_["impedance_scale"] = scale
            return sys_

        drt = self._drt_cache.get(key)
        with host_cpu():
            if drt is None:
                drt = DRT(interpolate_integrals=False, **self._drt_kw)
                drt.interpolate_lookups = self.template.interpolate_lookups
                drt.integrate_method = self.template.integrate_method
                if len(self._drt_cache) > 64:
                    self._drt_cache.clear()
                self._drt_cache[key] = drt
            sys_ = drt._qphb_fit_core(times, i_sig, v_sig, freq, z,
                                      nonneg=self.nonneg, prep_only=True,
                                      **self.fit_kw, **self.hyper_kw)
            # Resolve host-side hybrid weight factors: explicit kwargs pass
            # through; method='rp' computes them from the prep state exactly
            # as the serial path does (drt.py:1311-1319). method='weight'
            # stays in-device (it needs the initialized weights).
            ewf = cwf = None
            if sys_["data_type"] == "hybrid":
                ewf = sys_.get("eis_weight_factor")
                cwf = sys_.get("chrono_weight_factor")
                if sys_.get("hybrid_weight_factor_method") == "rp" \
                        and (ewf is None or cwf is None):
                    from .. import preprocessing as pp_mod
                    rp_eis = pp_mod.estimate_rp(None, None, None, None, None,
                                                drt.z_fit)
                    rp_chrono = pp_mod.estimate_rp(
                        drt.get_fit_times(), drt.step_times, drt.step_sizes,
                        drt.raw_response_signal, drt.step_model, None)
                    rp_tot = drt.coefficient_scale * sys_["hypers"]["rp_scale"]
                    if ewf is None:
                        ewf = rp_eis ** 0.75 / (rp_chrono ** 0.25
                                                * rp_tot ** 0.5)
                    if cwf is None:
                        cwf = rp_chrono ** 0.75 / (rp_eis ** 0.25
                                                   * rp_tot ** 0.5)
            sys_["host_eis_wf"] = ewf
            sys_["host_chrono_wf"] = cwf
        if self._fast_path_ok():
            cacheable = sys_["data_type"] == "eis"
            if sys_["data_type"] == "hybrid" \
                    and self._drt_kw["chrono_mode"] == "galv":
                # Snapshot the per-protocol chrono processing state the
                # hybrid rescale needs (see _hybrid_rescale)
                from .. import preprocessing as pp_mod
                downsample = bool(self.fit_kw.get("downsample", False))
                ds_kw = self.fit_kw.get("downsample_kw") or {}
                sys_["fp_sample_index"] = np.asarray(drt.sample_index)
                sys_["fp_filter"] = downsample and ds_kw.get("antialiased",
                                                             True)
                # downsample_data filters the response with step_index from
                # the NONCONSECUTIVE step times (preprocessing.py:380-383)
                sys_["fp_step_index"] = (pp_mod.get_step_indices_from_step_times(
                    np.asarray(times, dtype=float), drt.nonconsec_step_times)
                    if sys_["fp_filter"] else None)
                sys_["fp_step_times"] = np.atleast_1d(drt.step_times)
                sys_["fp_step_sizes"] = np.atleast_1d(drt.step_sizes)
                sys_["fp_offset_baseline"] = bool(
                    self.fit_kw.get("offset_baseline", True))
                cacheable = True
            if cacheable:
                if len(self._sys_cache) > 64:
                    self._sys_cache.clear()
                self._sys_cache[key] = sys_
        return sys_

    def _hybrid_rescale(self, tmpl, times, v_sig, z):
        """Per-observation rescale against a cached hybrid (galv) protocol
        template — the chrono/EIS analog of the EIS fast path above.

        Everything in the prep-only system except the data vector and the
        scale state is protocol-shared: matrices come from (times, i_signal,
        frequencies), hypers are static defaults+kwargs, and vz machinery
        depends only on the grids. Replicates, in order, what the serial
        prep does with (v_signal, z) (models/drt.py):
          * antialiasing filter + decimation of the response when
            downsampling (preprocessing.downsample_data)
          * scale_data: rp_est from chrono+EIS jointly; coefficient/
            impedance/response_signal scales (drt.py:345-391)
          * baseline offset + rzv assembly (drt.py:1102-1120)
          * host-side rp-method hybrid weight factors (drt.py:1311-1319)
        Parity vs the serial prep is pinned by
        tests/test_ragged.py::test_hybrid_fast_path_matches_serial_prep."""
        from .. import preprocessing as pp_mod
        v = np.asarray(v_sig, dtype=float)
        if tmpl["fp_filter"]:
            v = pp_mod.filter_chrono_signal(np.asarray(times, dtype=float), v,
                                            step_index=tmpl["fp_step_index"])
        v_sample = v[tmpl["fp_sample_index"]]
        z = np.asarray(z, dtype=complex)
        st, ss = tmpl["fp_step_times"], tmpl["fp_step_sizes"]
        sample_times = np.asarray(tmpl["sample_times"])
        step_model = self._drt_kw["step_model"]
        rp_est = pp_mod.estimate_rp(sample_times, st, ss, v_sample,
                                    step_model, z)
        scale = rp_est / tmpl["hypers"]["rp_scale"]
        response_scale = tmpl["input_signal_scale"] * scale
        v_scaled = v_sample / response_scale
        baseline = np.median(v_scaled[sample_times < st[0]])
        offset = -baseline if tmpl["fp_offset_baseline"] else 0.0
        z_scaled = z / scale
        sys_ = dict(tmpl)
        sys_["rzv"] = np.concatenate([v_scaled + offset,
                                      z_scaled.real, z_scaled.imag])
        sys_["coefficient_scale"] = scale
        sys_["impedance_scale"] = scale
        sys_["response_signal_scale"] = response_scale
        sys_["scaled_response_offset"] = offset
        ewf = tmpl.get("eis_weight_factor")
        cwf = tmpl.get("chrono_weight_factor")
        if tmpl.get("hybrid_weight_factor_method") == "rp" \
                and (ewf is None or cwf is None):
            rp_eis = pp_mod.estimate_rp(None, None, None, None, None, z)
            rp_chrono = pp_mod.estimate_rp(sample_times, st, ss, v_sample,
                                           step_model, None)
            # rp_tot = coefficient_scale * rp_scale == rp_est (drt.py:1315)
            if ewf is None:
                ewf = rp_eis ** 0.75 / (rp_chrono ** 0.25 * rp_est ** 0.5)
            if cwf is None:
                cwf = rp_chrono ** 0.75 / (rp_eis ** 0.25 * rp_est ** 0.5)
        sys_["host_eis_wf"] = ewf
        sys_["host_chrono_wf"] = cwf
        return sys_

    def _hybrid_rescale_batch(self, tmpl, items):
        """Vectorized ``_hybrid_rescale`` across observations sharing a
        cached protocol template: one (k, T) filter + one batched Rp
        estimate instead of k per-obs numpy passes. Row-for-row equal to the
        per-obs path (tests/test_ragged.py::test_batched_prep_matches_per_obs);
        the per-obs host loop was 29% of hybrid end-to-end wall on 512-obs
        maps (experiments/hybrid_profile.py)."""
        from .. import preprocessing as pp_mod
        times = np.asarray(items[0][0], dtype=float)
        v = np.asarray([it[1] for it in items], dtype=float)
        z = np.asarray([it[2] for it in items], dtype=complex)
        if tmpl["fp_filter"]:
            v = pp_mod.filter_chrono_signal_batch(times, v,
                                                  tmpl["fp_step_index"])
        v_sample = v[:, tmpl["fp_sample_index"]]
        st, ss = tmpl["fp_step_times"], tmpl["fp_step_sizes"]
        sample_times = np.asarray(tmpl["sample_times"])
        step_model = self._drt_kw["step_model"]
        rp_est = pp_mod.estimate_rp_batch(sample_times, st, ss, v_sample,
                                          step_model, z)
        scale = rp_est / tmpl["hypers"]["rp_scale"]
        response_scale = tmpl["input_signal_scale"] * scale
        v_scaled = v_sample / response_scale[:, None]
        if tmpl["fp_offset_baseline"]:
            offset = -np.median(v_scaled[:, sample_times < st[0]], axis=1)
        else:
            offset = np.zeros(len(items))
        z_scaled = z / scale[:, None]
        ewf = tmpl.get("eis_weight_factor")
        cwf = tmpl.get("chrono_weight_factor")
        if tmpl.get("hybrid_weight_factor_method") == "rp" \
                and (ewf is None or cwf is None):
            rp_eis = pp_mod.estimate_rp_batch(None, None, None, None,
                                              step_model, z)
            rp_chrono = pp_mod.estimate_rp_batch(sample_times, st, ss,
                                                 v_sample, step_model, None)
            ewf_b = (rp_eis ** 0.75 / (rp_chrono ** 0.25 * rp_est ** 0.5)
                     if ewf is None else np.full(len(items), ewf))
            cwf_b = (rp_chrono ** 0.75 / (rp_eis ** 0.25 * rp_est ** 0.5)
                     if cwf is None else np.full(len(items), cwf))
        else:
            ewf_b = np.full(len(items), np.nan if ewf is None else ewf)
            cwf_b = np.full(len(items), np.nan if cwf is None else cwf)
        outs = []
        for i in range(len(items)):
            sys_ = dict(tmpl)
            sys_["rzv"] = np.concatenate([v_scaled[i] + offset[i],
                                          z_scaled[i].real, z_scaled[i].imag])
            sys_["coefficient_scale"] = scale[i]
            sys_["impedance_scale"] = scale[i]
            sys_["response_signal_scale"] = response_scale[i]
            sys_["scaled_response_offset"] = offset[i]
            sys_["host_eis_wf"] = None if np.isnan(ewf_b[i]) else ewf_b[i]
            sys_["host_chrono_wf"] = None if np.isnan(cwf_b[i]) else cwf_b[i]
            outs.append(sys_)
        return outs

    def _eis_rescale_batch(self, tmpl, z_list):
        """Vectorized EIS fast-path rescale (the z-scaling branch of
        ``_prep_obs``) across observations sharing a cached protocol."""
        z = np.asarray(z_list, dtype=complex)
        zr = z.real
        rp_est = (np.maximum(zr.max(axis=1), 0.0)
                  - np.minimum(zr.min(axis=1), np.inf))
        scale = rp_est / tmpl["hypers"]["rp_scale"]
        z_scaled = z / scale[:, None]
        outs = []
        for i in range(len(z_list)):
            sys_ = dict(tmpl)
            sys_["rzv"] = np.concatenate([z_scaled[i].real, z_scaled[i].imag])
            sys_["coefficient_scale"] = scale[i]
            sys_["impedance_scale"] = scale[i]
            outs.append(sys_)
        return outs

    def _prep_systems(self, observations):
        """Per-obs prep with cached-protocol batching: observations whose
        protocol template is already in ``_sys_cache`` are grouped per
        protocol and rescaled in one vectorized pass (the first observation
        of each protocol still takes the full serial prep, populating the
        cache for the rest of THIS batch)."""
        systems = [None] * len(observations)
        pending = {}
        for idx, (c, e) in enumerate(observations):
            times, i_sig, v_sig = (c if c is not None and c[0] is not None
                                   else (None, None, None))
            freq, z = (e if e is not None and e[0] is not None
                       else (None, None))
            key = (None if times is None else np.asarray(times).tobytes(),
                   None if i_sig is None else np.asarray(i_sig).tobytes(),
                   None if freq is None else np.asarray(freq).tobytes())
            tmpl = getattr(self, "_sys_cache", {}).get(key)
            if tmpl is not None:
                pending.setdefault(key, []).append((idx, times, v_sig, z))
            else:
                systems[idx] = self._prep_obs(c, e)
        for key, items in pending.items():
            tmpl = self._sys_cache[key]
            if tmpl["data_type"] == "hybrid":
                outs = self._hybrid_rescale_batch(
                    tmpl, [(t, v, z) for (_, t, v, z) in items])
            else:
                outs = self._eis_rescale_batch(tmpl,
                                               [z for (_, _, _, z) in items])
            for (idx, *_), s in zip(items, outs):
                systems[idx] = s
        return systems

    def prepare(self, observations):
        """Prep + pad all observations; returns the device-ready batch dict."""
        systems = self._prep_systems(observations)
        _check_consistent(systems)
        ref = systems[0]
        cfg = ref["cfg"]
        ns = cfg.num_special
        data_type = ref["data_type"]

        n_rows = np.array([s["rzv"].shape[0] for s in systems])
        n_cols = np.array([s["rzm"].shape[1] for s in systems])
        r_max = int(n_rows.max())
        n_max = int(n_cols.max())
        b = len(systems)

        # Shared structures come from the widest-window observation: on the
        # log-uniform supergrid the DRT penalty blocks are Toeplitz, so the
        # narrower windows' penalty matrices are leading slices of the widest
        wide = int(np.argmax(n_cols))
        self.m_stack = np.zeros((3, n_max, n_max))
        self.m_stack[:, :n_cols[wide], :n_cols[wide]] = systems[wide]["m_stack"]
        lb_wide = systems[wide]["lb"]
        self.lb = np.zeros(n_max)
        self.lb[:len(lb_wide)] = lb_wide
        l1_wide = np.zeros(n_max)
        l1_wide[:len(systems[wide]["l1_lambda_vector"])] = \
            systems[wide]["l1_lambda_vector"]

        # Only the small data-dependent per-observation vectors are stored
        # batch-wide; the O(R*N) matrix stacks live per-PROTOCOL in `uniq`
        # below and are gathered to the full batch ON DEVICE (fit()). Never
        # materialize the (B, R, N) stacks on the host: beyond the transfer
        # cost, first-touch page faults on fresh 100MB+ host allocations run
        # at ~20 MB/s on the single-vCPU VM this targets.
        batch = {
            "rzv": np.zeros((b, r_max)),
            "var_floor": np.zeros(b),
            # NaN = "use the in-device weight factor" (see _fit_single)
            "host_row_factors": np.full((b, r_max), np.nan),
        }

        # Protocol identity per observation: observations sharing a
        # measurement protocol reference the SAME numpy design matrix
        # through the prep caches, so array identity partitions the batch.
        # Matrix padding is done once per protocol, leaving only the small
        # data-dependent vectors in the per-obs loop.
        proto_of = {}
        proto_index = np.array(
            [proto_of.setdefault(id(s["rzm"]), len(proto_of))
             for s in systems], dtype=np.int32)
        first_of_proto = np.array(
            [int(np.argmax(proto_index == p)) for p in range(len(proto_of))])
        n_proto = len(first_of_proto)
        uniq = {
            "rzm": np.zeros((n_proto, r_max, n_max)),
            "vmm": np.zeros((n_proto, r_max, r_max)),
            "rzm_vz": np.zeros((n_proto, r_max, n_max)),
            "vz_strength": np.zeros((n_proto, r_max)),
            "vz_sign": np.zeros((n_proto, r_max)),
            "chrono_row_mask": np.zeros((n_proto, r_max)),
            "row_mask": np.zeros((n_proto, r_max)),
            "col_mask": np.zeros((n_proto, n_max)),
            "l1v": np.zeros((n_proto, n_max)),
            "lb": np.zeros((n_proto, n_max)),
        }
        if self.per_obs_penalty:
            uniq["m_stack"] = np.zeros((n_proto, 3, n_max, n_max))
        for p, i in enumerate(first_of_proto):
            s = systems[i]
            r_i, n_i = s["rzv"].shape[0], s["rzm"].shape[1]
            nc_i = s["num_chrono"]
            uniq["rzm"][p, :r_i, :n_i] = s["rzm"]
            uniq["vmm"][p, :r_i, :r_i] = s["vmm"]
            uniq["rzm_vz"][p, :r_i, :n_i] = s["rzm_vz"]
            uniq["vz_strength"][p, :r_i] = s["vz_strength_vec"]
            uniq["vz_sign"][p, :nc_i] = 1.0
            uniq["vz_sign"][p, nc_i:r_i] = -1.0
            uniq["chrono_row_mask"][p, :nc_i] = 1.0
            uniq["row_mask"][p, :r_i] = 1.0
            uniq["col_mask"][p, :n_i] = 1.0
            # Padded columns get unit linear cost (with lb=0) so the QP pins
            # them at zero non-degenerately (x=0, dual=1)
            uniq["l1v"][p] = (l1_wide * uniq["col_mask"][p]
                              + (1.0 - uniq["col_mask"][p]))
            # lb must be 0 (not e.g. -1e5) at padded columns so the unit
            # linear cost pins them at the bound
            uniq["lb"][p] = np.where(uniq["col_mask"][p] > 0, self.lb, 0.0)
            if self.per_obs_penalty:
                uniq["m_stack"][p, :, :n_i, :n_i] = s["m_stack"]

        tau_indices, scales, extras = [], [], []
        hrf_protocol = True
        for i, s in enumerate(systems):
            r_i = s["rzv"].shape[0]
            nc_i = s["num_chrono"]
            batch["rzv"][i, :r_i] = s["rzv"]
            batch["var_floor"][i] = np.var(s["rzv"]) * 1e-7
            if s.get("host_chrono_wf") is not None:
                batch["host_row_factors"][i, :nc_i] = s["host_chrono_wf"]
                hrf_protocol = False
            if s.get("host_eis_wf") is not None:
                batch["host_row_factors"][i, nc_i:r_i] = s["host_eis_wf"]
                hrf_protocol = False
            left = nearest_index(self.tau_supergrid, s["basis_tau"][0])
            right = nearest_index(self.tau_supergrid, s["basis_tau"][-1]) + 1
            tau_indices.append((int(left), int(right)))
            scales.append(s["coefficient_scale"])
            extras.append(s)
        self._proto_index = proto_index
        self._first_of_proto = first_of_proto
        self._uniq = uniq
        # host_row_factors is a constant NaN row ("use device factors") when
        # no obs set data-dependent factors ('rp' method / explicit kwargs),
        # so it can skip the full-batch transfer too
        self._hrf_protocol = hrf_protocol

        self.cfg = cfg
        self.data_type = data_type
        self.hypers = ref["hypers"]
        cast_tree = lambda t: jax.tree.map(
            lambda v: v.astype(self.dtype) if hasattr(v, "astype") else v, t)
        self.hyp = cast_tree(_hypers_to_pytree(self.hypers))
        iw_hypers = dict(self.hypers)
        iw_hypers["l1_lambda_0"] = ref["iw_l1_lambda_0"]
        iw_hypers["l2_lambda_0"] = ref["iw_l2_lambda_0"]
        if "dop_l2_lambda_0" in self.hypers:
            iw_hypers["dop_l2_lambda_0"] = (self.hypers["dop_l2_lambda_0"]
                                            / self.hypers["l2_lambda_0"]
                                            * ref["iw_l2_lambda_0"])
        self.iw_hyp = cast_tree(_hypers_to_pytree(iw_hypers))
        self.special_qp_params = ref["special_qp_params"]
        self.hybrid_wf_method = ref["hybrid_weight_factor_method"]
        self.weight_factor = float(ref["weight_factor"] or 1.0)
        self.dop_scale_vector = ref["dop_scale_vector"]
        # DOP order-0 smoothing g-matrix (serial drt.py:1134-1139); the DOP
        # block sits at the same indices for every observation, so the
        # reference obs's stack applies batch-wide
        self.dop_gmat = None if ref.get("dop_gmat") is None \
            else np.stack([np.asarray(g) for g in ref["dop_gmat"]])
        self.inductance_scale = ref["inductance_scale"]
        self.capacitance_scale = ref["capacitance_scale"]
        self.fcfg = fitcore.FitConfig(
            cfg=cfg, data_type=data_type, num_chrono=0,
            vz_offset=ref["vz_offset"], vz_index=ref["vz_index"],
            max_iter=self.max_iter, x_rtol=self.xtol, max_hp_iter=1,
            qp_max_iter=self.qp_max_iter, qp_max_iter_warm=self.qp_max_iter_warm,
            pred_stop=self.pred_stop, pred_rtol=self.pred_rtol,
            qp_fused=self.qp_fused)

        self._tau_indices = tau_indices
        self._scales = np.asarray(scales, dtype=float)
        self._systems = extras
        self._n_rows = n_rows
        self._n_chrono = np.array([s["num_chrono"] for s in systems])
        self._last_batch = batch
        return batch

    def full(self, key):
        """Materialize one per-observation batch array (B, ...) by gathering
        the per-protocol stack. Cheap for the vector keys; for the O(R*N)
        matrix keys prefer per-protocol computation (``final_predictions``) —
        a fresh 100MB+ host allocation is first-touch bound on the
        single-vCPU target VM."""
        u = self._uniq[key]
        flat = np.take(u.reshape(u.shape[0], -1), self._proto_index, axis=0)
        return flat.reshape(len(self._proto_index), *u.shape[1:])

    def _per_proto_matvec(self, key, x):
        """y[i] = uniq[key][proto(i)] @ x[i], without gathering (B, R, N)."""
        u = self._uniq[key]
        pidx = self._proto_index[:x.shape[0]]
        y = np.zeros((x.shape[0], u.shape[1]))
        for p in range(u.shape[0]):
            m = pidx == p
            if m.any():
                y[m] = x[m] @ u[p].T
        return y

    def final_predictions(self, result):
        """Model predictions y_hat (B, R) at the final iterate, computed one
        protocol at a time. For hybrid fits the vz-offset column of the
        design matrix is rewritten each outer iteration from the current
        prediction (reference drt1d.py:972-979), so the stored protocol
        matrix's vz column is swapped for the final-solution one here."""
        x = np.asarray(result.x_raw)
        y = self._per_proto_matvec("rzm", x)
        ci = self.fcfg.vz_index
        if self.fcfg.vz_offset and ci >= 0:
            y_vz = self._per_proto_matvec("rzm_vz", x)
            newcol = y_vz * self.full("vz_sign") * self.full("vz_strength")
            oldcol = self._uniq["rzm"][self._proto_index[:len(x)], :, ci]
            y = y + x[:, ci:ci + 1] * (newcol - oldcol)
        return y

    def final_design_matrices(self, result):
        """Reconstruct the per-observation design matrices as they stood at
        the last outer iteration (see final_predictions). Materializes the
        full (B, R, N) stack — use only when the matrices themselves are
        needed; the fit/llh path uses final_predictions."""
        rzm = self.full("rzm")
        if self.fcfg.vz_offset and self.fcfg.vz_index >= 0:
            y_vz = self._per_proto_matvec("rzm_vz", result.x_raw)
            rzm[:, :, self.fcfg.vz_index] = (y_vz * self.full("vz_sign")
                                             * self.full("vz_strength"))
        return rzm

    # ------------------------------------------------------------------
    def _loop_setup(self, rzv, rzm, vmm, rzm_vz, vz_strength, vz_sign,
                    chrono_row_mask, row_mask, col_mask, l1v, lb, var_floor,
                    host_row_factors=None, m_stack=None):
        """Per-lane solver inputs shared by the plain, history, staged-phase
        and continuation entry points: weight initialization, hybrid row
        factors, and the positional/keyword argument packs for
        fitcore.qphb_fit_loop."""
        cfg = self.cfg
        n = rzm.shape[1]
        dtype = rzv.dtype
        if m_stack is None:
            m_stack = jnp.asarray(self.m_stack, dtype=dtype)
        else:
            m_stack = m_stack.astype(dtype)
        rho0 = jnp.asarray(self.hypers["rho_0"], dtype=dtype)
        dop_rho0 = jnp.asarray(self.hypers.get("dop_rho_0", np.ones(3)), dtype=dtype)
        s0 = jnp.stack([jnp.full(n, float(self.hypers["s_0"][k]), dtype=dtype)
                        for k in range(cfg.k_range)])

        outlier_p = self.hypers.get("outlier_p") if cfg.has_outlier else None
        est, init_w, _, out_t = qphb_mod.initialize_weights(
            self.iw_hyp, m_stack, rho0, dop_rho0, s0, rzv, rzm, vmm, lb, cfg,
            outlier_p=outlier_p, col_mask=col_mask, var_floor=var_floor)

        # Hybrid weight factors from the initialized weights
        # (reference drt1d.py:1103-1110, method='weight'), per observation
        if self.data_type == "hybrid" and self.hybrid_wf_method == "weight":
            eis_row_mask = row_mask - chrono_row_mask
            c_scale = (jnp.sum(chrono_row_mask * est ** -2)
                       / jnp.maximum(jnp.sum(chrono_row_mask), 1.0)) ** -0.5
            e_scale = (jnp.sum(eis_row_mask * est ** -2)
                       / jnp.maximum(jnp.sum(eis_row_mask), 1.0)) ** -0.5
            ratio = (e_scale / c_scale) ** 0.25
            row_factors = chrono_row_mask * ratio + (1.0 - chrono_row_mask) / ratio
        else:
            row_factors = jnp.ones_like(rzv)
        if host_row_factors is not None:
            # Host-resolved factors (explicit eis/chrono_weight_factor kwargs
            # or method='rp', reference drt1d.py:1303-1325) override the
            # in-device values row-wise; NaN marks "use the device value"
            row_factors = jnp.where(jnp.isnan(host_row_factors), row_factors,
                                    host_row_factors)

        x0 = jnp.full(n, 1e-6, dtype=dtype)
        one = jnp.asarray(1.0, dtype=dtype)
        dop_gmat = None if self.dop_gmat is None \
            else jnp.asarray(self.dop_gmat, dtype=dtype)
        loop_args = (rzm, rzv, vmm, m_stack, dop_gmat, l1v, lb, self.hyp,
                     x0, s0, rho0, dop_rho0, init_w, est, out_t,
                     rzm_vz, vz_strength, one, one,
                     jnp.asarray(self.weight_factor, dtype=dtype), self.fcfg)
        loop_kw = dict(col_mask=col_mask, var_floor=var_floor,
                       row_factors=row_factors, vz_sign=vz_sign,
                       row_mask=row_mask)
        return loop_args, loop_kw

    def _fit_single(self, *args, m_stack=None, with_history=False):
        loop_args, loop_kw = self._loop_setup(*args, m_stack=m_stack)
        if with_history:
            state, _, history = fitcore.qphb_fit_scan(*loop_args, **loop_kw)
            return state, loop_kw["row_factors"], history
        state, _ = fitcore.qphb_fit_loop(*loop_args, **loop_kw)
        # Return the per-row factors so collect() can store EFFECTIVE weights
        # (the serial path stores weights * domain factors, drt.py:1400-1403,
        # and llh/rss are evaluated against those)
        return state, loop_kw["row_factors"]

    # ------------------------------------------------------------------
    # Staged compaction (single-dispatch compacted continuation) for the
    # ragged batch: same scheduler as BatchedEISFitter._fit_staged
    # (parallel/batch.py), generalized to per-lane systems — every array the
    # loop consumes (design/variance/penalty matrices, masks, bounds) is
    # gathered alongside the solver state when the unconverged tail is
    # compacted into a smaller static-width sub-batch.
    def _phase_single(self, budget, *args, m_stack=None):
        """Run one lane to an iteration budget; also return the initialized
        weight estimate, row factors, and (with pred_stop) the settled
        check's prediction history the continuation stages need."""
        loop_args, loop_kw = self._loop_setup(*args, m_stack=m_stack)
        loop_args = (*loop_args[:-1], self.fcfg._replace(max_iter=int(budget)))
        if self.fcfg.pred_stop:
            state, _, y_prev, y_prev2 = fitcore.qphb_fit_loop(
                *loop_args, **loop_kw, return_pred_history=True)
            ph = (y_prev, y_prev2)
        else:
            state, _ = fitcore.qphb_fit_loop(*loop_args, **loop_kw)
            ph = None
        # loop_args[13] is est_weights (see _loop_setup's qphb_fit_loop pack)
        return state, loop_args[13], loop_kw["row_factors"], ph

    def _cont_single(self, state, est, row_factors, stop_at,
                     rzv, rzm, vmm, rzm_vz, vz_strength, vz_sign,
                     col_mask, row_mask, var_floor, l1v, lb, m_stack=None,
                     pred_history=None):
        """Resume one lane from an interrupted state to iteration stop_at.

        The loop carries rzm with its vz-offset column rewritten from the
        current iterate each iteration (fitcore._loop_body, ragged branch:
        vz_sep = y_hat * vz_sign); that column is a pure function of state.x,
        so the interrupted rzm is reconstructed exactly here instead of
        materializing per-lane (M, N) design matrices across stages."""
        dtype = rzv.dtype
        if m_stack is None:
            m_stack = jnp.asarray(self.m_stack, dtype=dtype)
        else:
            m_stack = m_stack.astype(dtype)
        dop_gmat = None if self.dop_gmat is None \
            else jnp.asarray(self.dop_gmat, dtype=dtype)
        one = jnp.asarray(1.0, dtype=dtype)
        if self.fcfg.data_type == "hybrid" and self.fcfg.vz_offset:
            y_hat = rzm_vz @ state.x
            rzm = rzm.at[:, self.fcfg.vz_index].set(
                y_hat * vz_sign * vz_strength)
        kw = {}
        if self.fcfg.pred_stop:
            # The settled check's prediction history is resumable state;
            # carrying it across the stage boundary keeps the staged
            # trajectory bitwise identical to the uninterrupted loop
            kw = dict(y_prev0=pred_history[0], y_prev2_0=pred_history[1],
                      return_pred_history=True)
        out = fitcore.qphb_fit_loop_from_state(
            state, rzm, rzv, vmm, m_stack, dop_gmat, l1v, lb, self.hyp, est,
            rzm_vz, vz_strength, one, one,
            jnp.asarray(self.weight_factor, dtype=dtype),
            self.fcfg._replace(max_iter=int(stop_at)),
            col_mask=col_mask, var_floor=var_floor, row_factors=row_factors,
            vz_sign=vz_sign, row_mask=row_mask, **kw)
        if self.fcfg.pred_stop:
            state, _, y_prev, y_prev2 = out
            return state, (y_prev, y_prev2)
        return out[0], None

    def _fit_staged(self, args, cfg_sig, phase_budgets=(8, 16),
                    capacities=None, buckets=None):
        """Single-dispatch staged compaction over the prepared per-lane
        arrays; returns (states, row_factors). See
        BatchedEISFitter._fit_staged for the scheduler rationale (phase to a
        small budget, gather still-active lanes first via stable argsort into
        a static-capacity sub-batch, continue, scatter back; full-width
        safety net covers capacity overflow and is free when every lane is
        converged).

        buckets > 1 splits each stage's gathered lanes into that many
        difficulty-ordered sub-dispatches (parallel/batch.py rationale:
        one slow lane no longer pins the whole stage at its max iteration).
        Requires pred_stop for the difficulty signal; the default scales
        with batch size (2 at B<=2048 up to 8 at B>=8192)."""
        per_obs = self.per_obs_penalty
        b = int(args[0].shape[0])
        max_iter = self.fcfg.max_iter
        budgets = [int(x) for x in phase_budgets if int(x) < max_iter]
        b1 = budgets[0] if budgets else max_iter
        stops = ([*budgets[1:], max_iter] if budgets else [])
        n_dev = 1 if self.mesh is None else int(self.mesh.shape[sh.BATCH_AXIS])
        if capacities is None:
            # Geometric halving per stage; measured best on the bench
            # workload for the shared-grid fitters (parallel/batch.py)
            capacities = [b >> (i + 1) for i in range(len(stops))]
        caps = []
        for c in capacities[:len(stops)]:
            c = min(max(int(c), 1), b)
            if n_dev > 1:
                c = min(-(-c // n_dev) * n_dev, b)
            caps.append(c)

        if buckets is None:
            # Scale with batch size (parallel/batch.py rationale: more lanes
            # sample deeper into the straggler tail; measured flat-to-B=8192
            # device throughput at buckets=8)
            buckets = max(2, min(8, b // 1024)) if self.fcfg.pred_stop else 1
        buckets = max(int(buckets), 1)
        if not self.fcfg.pred_stop:
            buckets = 1  # no difficulty signal without the pred history

        jits = getattr(self, "_staged_jits", None)
        if jits is None:
            jits = self._staged_jits = {}
        key = (cfg_sig, b, b1, tuple(stops), tuple(caps), buckets)
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

            def phase_one(*a):
                return self._phase_single(
                    b1, *a[:13], m_stack=(a[13] if per_obs else None))

            def cont_stage(stop_at):
                def cont_one(st, e, rf, p, *a):
                    return self._cont_single(
                        st, e, rf, stop_at, a[0], a[1], a[2], a[3], a[4],
                        a[5], a[8], a[7], a[11], a[9], a[10],
                        m_stack=(a[13] if per_obs else None),
                        pred_history=p)
                return cont_one

            def staged(*arr):
                states, est, row_factors, ph = jax.vmap(phase_one)(*arr)
                for stop_at, cap in zip(stops, caps):
                    # Stable sort of the converged flag: active lanes first,
                    # in original order; converged lanes pad the tail (their
                    # continuation is a no-op)
                    idx = jnp.argsort(states.converged, stable=True)[:cap]
                    widths = bucket_widths(cap)
                    if len(widths) > 1:
                        # Order the stage's lanes easiest-first (converged
                        # pad lanes last) so each bucket's while_loop stops
                        # at its own members' max iteration (padded rows
                        # predict 0 in both history slots, so they don't
                        # skew the settledness score)
                        diff = jnp.sum((ph[0] - ph[1]) ** 2, axis=1)
                        key_d = jnp.where(states.converged, jnp.inf, diff)
                        idx = idx[jnp.argsort(key_d[idx], stable=True)]
                    lo = 0
                    for w in widths:
                        sub_idx = idx[lo:lo + w]
                        lo += w
                        take = lambda a: jnp.take(a, sub_idx, axis=0)
                        sub = jax.tree.map(take, states)
                        out, out_ph = jax.vmap(cont_stage(stop_at))(
                            sub, take(est), take(row_factors),
                            jax.tree.map(take, ph), *[take(a) for a in arr])
                        scatter = lambda full, part: full.at[sub_idx].set(part)
                        states = jax.tree.map(scatter, states, out)
                        ph = jax.tree.map(scatter, ph, out_ph)
                # Full-width safety net for capacity overflow
                states, _ = jax.vmap(cont_stage(max_iter))(
                    states, est, row_factors, ph, *arr)
                return states, row_factors
            fn = jits[key] = jax.jit(staged)
        return fn(*args)

    # ------------------------------------------------------------------
    def fit(self, observations, return_states=False, return_history=False,
            adaptive=False, phase_budgets=None, staged_capacities=None,
            staged_buckets=None):
        """Fit heterogeneous observations as one vmapped computation.

        return_history=True appends a (B, max_iter, ...) per-iteration
        history dict (batched analog of the reference's qphb_history,
        hybdrt/models/qphb.py:950-966); padded rows/columns behave as in
        the final state.

        adaptive="staged" (or True) enables single-dispatch staged
        compaction: the batch is phased to a small iteration budget, then
        only the still-unconverged tail is gathered into shrinking
        static-capacity sub-batches and continued, all inside ONE jitted XLA
        program (see _fit_staged / parallel/batch.py). Trajectories are
        identical to the uninterrupted loop. The host-driven adaptive
        variant of the shared-grid fitters is not offered here — per-lane
        matrix stacks make host round-trips per phase strictly worse — so
        True aliases "staged"."""
        # Validate scheduling kwargs up front — prepare() plus device
        # transfer is the expensive part of a fit; a typo'd kwarg should
        # fail before paying it
        if adaptive:
            if adaptive not in (True, "staged"):
                raise ValueError(f"adaptive={adaptive!r}: the ragged fitter "
                                 f"supports False or 'staged' (True aliases "
                                 f"'staged')")
            if return_history:
                raise ValueError("return_history is a fixed-length scan; "
                                 "it cannot be combined with staged "
                                 "compaction")
            if phase_budgets is not None:
                budgets = [int(x) for x in phase_budgets]
                if budgets != sorted(budgets):
                    raise ValueError(
                        f"phase_budgets={tuple(phase_budgets)} must be "
                        f"ascending: each stage continues to a LARGER "
                        f"iteration stop (an out-of-order stop is a no-op "
                        f"silently absorbed by the safety net)")

        batch = self.prepare(observations)
        b_orig = batch["rzv"].shape[0]

        # Batch bucketing: pad the batch axis up to the next power of two by
        # REPEATING observation 0 (duplicate lanes converge like the real
        # lane — no stragglers — and collect() discards them). Incremental
        # mapping workloads call fit() with a different batch size each
        # acquisition; without bucketing every new size re-traces and
        # re-compiles the jitted entry (~minutes on a 1-vCPU host).
        proto_idx = self._proto_index
        if self.batch_bucket and self.mesh is None and b_orig > 1 \
                and not return_history:
            b_pad = 1 << (b_orig - 1).bit_length()
            if b_pad > b_orig:
                pad = b_pad - b_orig
                batch = {k: np.concatenate(
                    [v, np.repeat(v[:1], pad, axis=0)]) for k, v in batch.items()}
                proto_idx = np.concatenate(
                    [proto_idx, np.repeat(proto_idx[:1], pad)])

        # Protocol-deduplicated transfer: the per-observation matrix stacks
        # (design, variance, penalty, masks) are IDENTICAL for observations
        # sharing a measurement protocol. prepare() never materializes the
        # full (B, R, R)+(B, 3, N, N) batch on the host (first-touch-bound
        # there, and host->device transfer of it dominates wall-clock on a
        # tunneled chip): upload one copy per protocol and gather to the
        # full batch on device.
        uniq = self._uniq
        if self.mesh is not None:
            idx_pad, _ = sh.pad_batch(proto_idx, self.mesh)
            idx_dev = sh.shard_batch(jnp.asarray(idx_pad), self.mesh)
            rep = sh.replicated_sharding(self.mesh)
            arrays = {k: jnp.take(
                jax.device_put(jnp.asarray(u, dtype=self.dtype), rep),
                idx_dev, axis=0) for k, u in uniq.items()}
            arrays.update({k: sh.shard_batch(jnp.asarray(
                sh.pad_batch(np.asarray(v), self.mesh)[0], dtype=self.dtype),
                self.mesh) for k, v in batch.items()})
        else:
            idx_dev = jnp.asarray(proto_idx)
            arrays = {k: jnp.take(jnp.asarray(u, dtype=self.dtype),
                                  idx_dev, axis=0)
                      for k, u in uniq.items()}
            for k, v in batch.items():
                if k == "host_row_factors" and self._hrf_protocol:
                    arrays[k] = jnp.broadcast_to(
                        jnp.full(v.shape[1:], jnp.nan, dtype=self.dtype),
                        (v.shape[0], *v.shape[1:]))
                else:
                    arrays[k] = jnp.asarray(v, dtype=self.dtype)

        args = [arrays["rzv"], arrays["rzm"], arrays["vmm"],
                arrays["rzm_vz"], arrays["vz_strength"],
                arrays["vz_sign"], arrays["chrono_row_mask"],
                arrays["row_mask"], arrays["col_mask"],
                arrays["l1v"], arrays["lb"], arrays["var_floor"],
                arrays["host_row_factors"]]
        # Jitted entry points are cached on the instance (rebuilding per call
        # would retrace and recompile the whole fit). The cache key includes
        # the prepare()-derived configuration the closure captures as
        # constants: jit's own cache keys only on shapes, so without this a
        # later batch with coincidentally matching padded shapes would run
        # under the previous batch's fcfg/data_type/penalty stack.
        cfg_sig = (self.data_type, self.fcfg, self.weight_factor,
                   self.hybrid_wf_method, self.per_obs_penalty,
                   bool(return_history),
                   None if self.per_obs_penalty
                   else np.asarray(self.m_stack).tobytes(),
                   None if self.dop_gmat is None
                   else np.asarray(self.dop_gmat).tobytes())
        if getattr(self, "_fit_batch_sig", None) != cfg_sig:
            self._fit_batch_sig = cfg_sig
            if self.per_obs_penalty:
                self._fit_batch_jit = jax.jit(jax.vmap(
                    lambda *a: self._fit_single(*a[:-1], m_stack=a[-1],
                                                with_history=return_history)))
            else:
                self._fit_batch_jit = jax.jit(jax.vmap(
                    lambda *a: self._fit_single(*a,
                                                with_history=return_history)))
        fit_batch = self._fit_batch_jit
        if self.per_obs_penalty:
            args.append(arrays["m_stack"])
        if adaptive:
            states, row_factors = self._fit_staged(
                args, cfg_sig,
                phase_budgets=(8, 16) if phase_budgets is None
                else phase_budgets, capacities=staged_capacities,
                buckets=staged_buckets)
            return self.collect(states, b_orig, row_factors=row_factors,
                                return_states=return_states)
        if return_history:
            states, row_factors, history = fit_batch(*args)
            history = {k: np.asarray(v)[:b_orig] for k, v in history.items()}
            result = self.collect(states, b_orig, row_factors=row_factors,
                                  return_states=return_states)
            if return_states:
                return (*result, history)
            return result, history
        states, row_factors = fit_batch(*args)
        return self.collect(states, b_orig, row_factors=row_factors,
                            return_states=return_states)

    def collect(self, states, b_orig, row_factors=None, return_states=False):
        from .batch import _fetch_states
        # ONE device->host transfer; duals/outlier weights only ride along
        # when the caller keeps the raw states (see batch._fetch_states)
        states = _fetch_states(
            states, drop=() if return_states else ("qp_dual", "outlier_t"))
        x_full = np.asarray(states.x)[:b_orig]
        scale = self._scales[:b_orig]
        ns = self.cfg.num_special
        sp = self.special_qp_params

        def special(name, col_scale=1.0):
            if name in sp:
                return x_full[:, sp[name]["index"]] * scale * col_scale
            return np.zeros(b_orig)

        x_dop = None
        if self.cfg.fit_dop:
            ds_, de_ = self.cfg.dop_start, self.cfg.dop_start + self.cfg.dop_size
            x_dop = (x_full[:, ds_:de_] * np.asarray(self.dop_scale_vector)[None, :]
                     * scale[:, None])

        result = RaggedFitResult(
            x=x_full[:, ns:] * scale[:, None],
            tau_indices=self._tau_indices,
            r_inf=special("R_inf"),
            inductance=special("inductance", self.inductance_scale or 1.0),
            c_inv=special("C_inv", self.capacitance_scale or 1.0),
            x_dop=x_dop,
            scale=scale,
            weights=np.asarray(states.weights)[:b_orig]
            * (1.0 if row_factors is None
               else np.asarray(row_factors)[:b_orig]),
            rho=np.asarray(states.rho_vector)[:b_orig],
            s_vectors=np.asarray(states.s_vectors)[:b_orig],
            n_iter=np.asarray(states.it)[:b_orig],
            converged=np.asarray(states.converged)[:b_orig],
            x_raw=x_full,
            num_rows=self._n_rows[:b_orig],
            num_chrono=self._n_chrono[:b_orig],
        )
        if return_states:
            return result, states
        return result
