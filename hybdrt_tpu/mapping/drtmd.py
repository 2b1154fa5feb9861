"""DRTMD: multi-dimensional DRT mapping over operating-condition coordinates.

Container + driver for fitting hundreds-thousands of spectra observed at
coordinates psi, on a shared tau supergrid (reference hybdrt/mapping/drtmd.py).

Two fit paths:
  * ``fit_all()`` — per-observation fits through the workhorse DRT instance
    (handles mixed chrono/EIS/hybrid data and per-observation grids), as in
    the reference's serial loop (drtmd.py:303-319);
  * ``fit_all(batched=True)`` — the TPU path: when all observations are EIS
    spectra on one shared frequency grid, the entire set is fitted as one
    vmapped, mesh-sharded XLA computation (hybdrt_tpu.parallel), replacing the
    serial loop with a single device program.
"""
import pickle
import time
import warnings
from pathlib import Path
from typing import Callable, Optional

import numpy as np

from ..models.drt import DRT
from ..utils.array import nearest_index
from . import resolve as resolve_mod

# Marks a fitter cache key component that cannot be reliably hashed
# (non-primitive fit kwargs): the fitter is built fresh and never cached
_UNCACHEABLE = object()


class DRTMD:
    def __init__(self, tau_supergrid, psi_dim_names=None, store_attr_categories=None,
                 extend_basis_decades=1, tau_basis_type="gaussian", tau_epsilon=None,
                 step_model="ideal", chrono_mode="galv", fit_inductance=True,
                 fit_ohmic=True, fit_capacitance=False, fixed_basis_nu=None,
                 fit_dop=False, normalize_dop=True, nu_basis_type="gaussian",
                 nu_epsilon=None, chrono_reader: Optional[Callable] = None,
                 eis_reader: Optional[Callable] = None, fit_kw=None, fit_type="drt",
                 pfrt_factors=None, batch_fit_kw=None,
                 print_diagnostics=False, print_progress=True, warn=False):
        self.drt1d = DRT(tau_supergrid=tau_supergrid, tau_epsilon=tau_epsilon,
                         tau_basis_type=tau_basis_type, fixed_basis_nu=fixed_basis_nu,
                         nu_epsilon=nu_epsilon, nu_basis_type=nu_basis_type,
                         extend_basis_decades=extend_basis_decades,
                         step_model=step_model, chrono_mode=chrono_mode,
                         fit_inductance=fit_inductance, fit_ohmic=fit_ohmic,
                         fit_capacitance=fit_capacitance, fit_dop=fit_dop,
                         normalize_dop=normalize_dop, warn=warn,
                         print_diagnostics=print_diagnostics)

        self.psi_dim_names = psi_dim_names
        if store_attr_categories is None:
            # pfrt fits need the per-factor results ('detail') to rebuild
            # covariances later
            store_attr_categories = ["config", "fit_core"] \
                + (["detail"] if fit_type == "pfrt" else [])
        self.store_attr_categories = store_attr_categories

        self.tau_supergrid = np.asarray(tau_supergrid)
        self.tau_basis_type = tau_basis_type
        self.tau_epsilon = self.drt1d.tau_epsilon
        self.fit_inductance = fit_inductance
        self.fit_ohmic = fit_ohmic
        self.fit_capacitance = fit_capacitance
        self.fixed_basis_nu = fixed_basis_nu
        self.nu_basis_type = nu_basis_type
        self.nu_epsilon = nu_epsilon
        self.fit_dop = fit_dop
        self.normalize_dop = normalize_dop
        self.step_model = step_model
        self.chrono_mode = chrono_mode
        # Extra kwargs forwarded to every batched fitter
        # (parallel/batch.py, parallel/ragged.py): the throughput knobs —
        # qp_max_iter / qp_max_iter_warm, pred_stop / pred_rtol, qp_fused,
        # batch_bucket, max_iter, xtol (constructor kwargs), plus the
        # scheduling keys adaptive / phase_budgets / staged_capacities,
        # which are routed to the fit() CALLS of the shared-grid fitters
        # (e.g. adaptive="staged" for the single-dispatch compaction
        # schedule; the ragged fallback ignores them). Defaults (empty)
        # keep reference convergence semantics.
        self.batch_fit_kw = dict(batch_fit_kw or {})

        if chrono_reader is None:
            def chrono_reader(file):
                from .. import fileload as fl
                return fl.read_chrono(file, return_tuple=True)
        self.chrono_reader = chrono_reader
        if eis_reader is None:
            def eis_reader(file):
                from .. import fileload as fl
                return fl.read_eis(file, return_tuple=True)
        self.eis_reader = eis_reader

        if fit_type not in ("drt", "pfrt"):
            raise ValueError(f"Invalid fit_type {fit_type}. Options: ['drt', 'pfrt']")
        self.fit_type = fit_type
        # Regularization-strength sweep levels for fit_type='pfrt'
        # (reference drtmd.py:98-100)
        self.pfrt_factors = np.logspace(-0.7, 0.7, 11) if pfrt_factors is None \
            else np.asarray(pfrt_factors)
        fit_kw = dict(fit_kw or {})
        fit_kw.setdefault("nonneg", True)
        self.fit_kw = fit_kw

        # Observation store
        self.obs_psi = None if psi_dim_names is None else np.zeros((0, len(psi_dim_names)))
        self.obs_data = []
        self.obs_group_id = []
        self.obs_data_badness = np.zeros(0)
        self.obs_ignore_flag = np.zeros(0, dtype=bool)

        # Fit results
        self.obs_x = np.zeros((0, *self.drt_param_shape()))
        self.obs_drt_var = np.zeros((0, len(self.tau_supergrid)))
        self.obs_special = None
        self.obs_fit_attr = []
        self.obs_fit_status = np.zeros(0, dtype=bool)
        self.obs_fit_errors = []
        self.obs_fit_badness = np.zeros(0)
        self.obs_tau_indices = []
        self.obs_llh = np.zeros(0)
        self.obs_rss = np.zeros(0)

        # Resolved / filtered results
        self.obs_resolve_status = np.zeros(0, dtype=bool)
        self.obs_x_resolved = np.zeros((0, len(self.tau_supergrid)))
        self.obs_special_resolved = None
        self.obs_x_filt = np.zeros((0, len(self.tau_supergrid)))
        self.obs_special_filt = None
        # Diagnostics from the last resolve_group call (coupled path fills
        # in n_iter / kkt_residual / kkt_tol)
        self.resolve_info = None

        self.print_diagnostics = print_diagnostics
        self.print_progress = print_progress
        self.warn = warn

    # ------------------------------------------------------------------
    @property
    def num_obs(self):
        return len(self.obs_data)

    def drt_param_shape(self):
        if self.fit_type == "pfrt":
            return (len(self.pfrt_factors), len(self.tau_supergrid))
        return (len(self.tau_supergrid),)

    def special_param_shape(self, key):
        sp = self.drt1d.special_qp_params.get(key, {"size": 1})
        size = sp.get("size", 1)
        base = () if size == 1 else (size,)
        if self.fit_type == "pfrt":
            return (len(self.pfrt_factors), *base)
        return base

    def validate_psi(self, psi):
        if self.psi_dim_names is not None and len(psi) != len(self.psi_dim_names):
            raise ValueError(f"psi must have {len(self.psi_dim_names)} entries")

    # ------------------------------------------------------------------
    # Observation management (reference drtmd.py:186-243)
    # ------------------------------------------------------------------
    def add_observation(self, psi, chrono_data, eis_data, group_id=None, fit=False):
        psi = np.atleast_1d(psi).flatten()
        if self.obs_psi is None:
            self.obs_psi = np.zeros((0, len(psi)))
        self.validate_psi(psi)

        n = self.num_obs
        self.obs_psi = np.insert(self.obs_psi, n, psi, axis=0)
        self.obs_data.append((chrono_data, eis_data))
        self.obs_data_badness = np.append(self.obs_data_badness, 0)
        self.obs_group_id.append(group_id)
        self.obs_ignore_flag = np.append(self.obs_ignore_flag, False)
        self.obs_fit_status = np.append(self.obs_fit_status, False)
        self.obs_fit_errors.append(None)
        self.obs_fit_badness = np.append(self.obs_fit_badness, 0)
        self.obs_fit_attr.append(None)
        self.obs_tau_indices.append(None)
        zero_row = np.zeros((1, *self.drt_param_shape()))
        zero_flat = np.zeros((1, len(self.tau_supergrid)))
        self.obs_x = np.concatenate([self.obs_x, zero_row])
        self.obs_drt_var = np.concatenate([self.obs_drt_var, zero_flat])
        self.obs_x_resolved = np.concatenate([self.obs_x_resolved, zero_flat])
        self.obs_x_filt = np.concatenate([self.obs_x_filt, zero_flat])
        self.obs_llh = np.append(self.obs_llh, 0)
        self.obs_rss = np.append(self.obs_rss, 0)
        self.obs_resolve_status = np.append(self.obs_resolve_status, False)

        if self.obs_special is not None:
            for key in self.obs_special:
                shape = (1, *self.special_param_shape(key))
                self.obs_special[key] = np.concatenate([self.obs_special[key],
                                                        np.zeros(shape)])
                self.obs_special_resolved[key] = np.concatenate(
                    [self.obs_special_resolved[key], np.zeros(shape)])
                self.obs_special_filt[key] = np.concatenate(
                    [self.obs_special_filt[key], np.zeros(shape)])
        if fit:
            self.fit_observation(self.num_obs - 1)

    def add_observations(self, psi_array, chrono_data_list=None, eis_data_list=None,
                         group_ids=None):
        n = len(psi_array)
        chrono_data_list = chrono_data_list or [None] * n
        eis_data_list = eis_data_list or [None] * n
        group_ids = group_ids if group_ids is not None else [None] * n
        for psi, cd, ed, gid in zip(psi_array, chrono_data_list, eis_data_list, group_ids):
            self.add_observation(psi, cd, ed, group_id=gid)

    def get_obs_data(self, obs_index):
        chrono_data, eis_data = self.obs_data[obs_index]
        if isinstance(chrono_data, (str, Path)):
            chrono_data = self.chrono_reader(chrono_data)
        elif chrono_data is None:
            chrono_data = (None, None, None)
        if isinstance(eis_data, (str, Path)):
            eis_data = self.eis_reader(eis_data)
        elif eis_data is None:
            eis_data = (None, None)
        return chrono_data, eis_data

    def initialize_obs_special(self):
        self.obs_special = {}
        self.obs_special_resolved = {}
        self.obs_special_filt = {}
        for key in self.drt1d.special_qp_params:
            shape = (self.num_obs, *self.special_param_shape(key))
            self.obs_special[key] = np.zeros(shape)
            self.obs_special_resolved[key] = np.zeros(shape)
            self.obs_special_filt[key] = np.zeros(shape)

    def format_1d_params(self, drt, left_index, right_index):
        if self.fit_type == "pfrt":
            # One solution per regularization factor (reference drtmd.py:1145-1156)
            fit_params = [drt.extract_qphb_parameters(x_raw)
                          for x_raw in drt.pfrt_result["step_x"]]
            x_drt = np.zeros(self.drt_param_shape())
            x_drt[:, left_index:right_index] = np.array([fp["x"] for fp in fit_params])
            x_special = {}
            for key in drt.special_qp_params:
                vals = np.array([np.atleast_1d(fp[key]) for fp in fit_params])
                if self.special_param_shape(key) == (len(self.pfrt_factors),):
                    vals = vals[:, 0]
                x_special[key] = vals
            return x_drt, x_special
        x_drt = np.zeros(len(self.tau_supergrid))
        x_drt[left_index:right_index] = drt.fit_parameters["x"]
        x_special = {k: drt.fit_parameters.get(k)
                     for k in drt.special_qp_params}
        for k in drt.special_qp_params:
            if k == "v_baseline":
                x_special[k] = np.atleast_1d(drt.fit_parameters["v_baseline"])
                if self.special_param_shape(k) == ():
                    x_special[k] = x_special[k][0]
        return x_drt, x_special

    # ------------------------------------------------------------------
    # Fitting (reference drtmd.py:245-328)
    # ------------------------------------------------------------------
    def estimate_obs_drt_var(self, obs_index=None, refresh=False):
        """Fill obs_drt_var for batched-fit observations.

        The serial path stores each observation's DRT variance during the
        fit (drtmd.py:315); batched fits skip it (the vmapped loop returns
        only final state). This reconstructs each observation's posterior
        covariance from its stored (P, q) state via get_fit — host-side,
        O(n^3) per observation — and records the supergrid-aligned diagonal."""
        if obs_index is None:
            obs_index = np.where(self.obs_fit_status)[0]
        groups, slow = {}, []
        for i in np.atleast_1d(obs_index):
            if not refresh and np.any(self.obs_drt_var[i] != 0):
                continue
            attr = self.obs_fit_attr[i]
            if self.obs_fit_status[i] \
                    and not (isinstance(attr, dict) and attr.get("batched")):
                continue  # serial fits stored it during the fit
            key = self._uniform_group_key(i)
            if key is None:
                # ragged/pfrt per-obs systems, or failed/unfitted obs whose
                # stale attrs must not be rebuilt (get_fit raises for those)
                slow.append(i)
            else:
                groups.setdefault(key, []).append(i)
        for idx in groups.values():
            if len(idx) == 1:
                slow.extend(idx)
            else:
                self._estimate_drt_var_group(idx)
        for i in slow:
            drt = self.get_fit(i)
            cov = drt.estimate_distribution_cov(tau=self.tau_supergrid,
                                                extend_var=True)
            if cov is not None:
                self.obs_drt_var[i] = np.diag(cov)
        return self.obs_drt_var

    def _estimate_drt_var_group(self, idx):
        """Vectorized obs_drt_var for uniform-batched observations sharing a
        protocol: ALL posterior precisions P are rebuilt, inverted, and
        basis-transformed in one vmapped computation instead of one device
        round trip per observation (each get_fit rebuild costs a tunneled
        dispatch; at 1000 observations the serial loop is ~40 s of RTT).
        Matches the per-observation path (get_fit ->
        estimate_distribution_cov(tau=tau_supergrid, extend_var=True)):
        same calculate_pq, Cholesky inverse, B Sigma B^T transform, and
        out-of-window variance extrapolation (models/drt.py:2278-2293)."""
        import jax
        import jax.numpy as jnp
        from ..ops import basis as basis_mod
        from ..utils.device import host_cpu

        attrs = [self.obs_fit_attr[i] for i in idx]
        fitter = self._resolve_batch_fitter(idx[0], attrs[0])
        template = fitter.template
        ns = template.qphb_params["cfg"].num_special
        p_b, _ = self._uniform_pq(fitter, attrs)
        scale_b = np.array([float(a["scale"]) for a in attrs])

        # Basis -> supergrid evaluation matrix (shared; order 0)
        em = basis_mod.func_eval_matrix_host(
            np.log(np.asarray(template.basis_tau)),
            np.log(np.asarray(self.tau_supergrid)), template.tau_basis_type,
            template.tau_epsilon, 0, template.zga_params)

        with host_cpu():
            def var_one(p):
                chol = jnp.linalg.cholesky(p)
                cov = jax.scipy.linalg.cho_solve(
                    (chol, True), jnp.eye(p.shape[0], dtype=p.dtype))
                cov_drt = cov[ns:, ns:]
                return jnp.einsum("tj,jk,tk->t", jnp.asarray(em), cov_drt,
                                  jnp.asarray(em))
            var = np.asarray(jax.vmap(var_one)(jnp.asarray(p_b)))
        bad = ~np.all(np.isfinite(var), axis=1)
        var = var * scale_b[:, None] ** 2

        # Out-of-window variance extrapolation (drt.py:2278-2293)
        tau = np.asarray(self.tau_supergrid)
        left = tau < template.basis_tau[0]
        right = tau > template.basis_tau[-1]
        if left.any() and (~left).any():
            ref = var[:, ~left][:, 0]
            var[:, left] += ref[:, None] \
                * np.log(template.basis_tau[0] / tau[left])[None, :] ** 2
        if right.any() and (~right).any():
            ref = var[:, ~right][:, -1]
            var[:, right] += ref[:, None] \
                * np.log(tau[right] / template.basis_tau[-1])[None, :] ** 2

        for bi, i in enumerate(idx):
            if bad[bi]:
                # Non-SPD P (rare): fall back to the per-obs path, which
                # retries with a general inverse (ops/mat1d.py:invert_psd)
                drt = self.get_fit(i)
                cov = drt.estimate_distribution_cov(
                    tau=self.tau_supergrid, extend_var=True)
                if cov is not None:
                    self.obs_drt_var[i] = np.diag(cov)
            else:
                self.obs_drt_var[i] = var[bi]

    def fit_convergence_summary(self):
        """Structured convergence telemetry for batched fits.

        Returns a dict with per-observation arrays: ``converged`` (bool;
        False for unfitted/failed obs), ``n_iter`` (-1 where unknown), the
        failure messages recorded by ignore_errors, and aggregate counts.
        The serial path warns per fit instead (drt1d); this is the batched
        equivalent of inspecting the reference's per-obs fit loop output."""
        n = self.num_obs
        converged = np.zeros(n, dtype=bool)
        n_iter = np.full(n, -1, dtype=int)
        for i in range(n):
            attr = self.obs_fit_attr[i] if i < len(self.obs_fit_attr) else None
            if isinstance(attr, dict) and attr.get("batched"):
                converged[i] = attr.get("converged", False)
                n_iter[i] = attr.get("n_iter", -1)
            elif self.obs_fit_status[i]:
                # Serial fits store the full drt1d attribute dict
                converged[i] = True
        errors = [str(e) if e is not None else None for e in self.obs_fit_errors]
        return {
            "converged": converged,
            "n_iter": n_iter,
            "errors": errors,
            "num_fitted": int(np.sum(self.obs_fit_status)),
            "num_failed": int(sum(e is not None for e in self.obs_fit_errors)),
            "num_converged": int(np.sum(converged)),
        }

    def fit_observation(self, obs_index, ignore_errors=False):
        chrono_data, eis_data = self.get_obs_data(obs_index)
        try:
            times = chrono_data[0]
            freq = eis_data[0]
            if times is None and freq is None:
                raise ValueError("Observation has no data")
            if self.fit_type == "pfrt":
                fit_kw = dict(self.fit_kw, factors=self.pfrt_factors)
                if times is None:
                    self.drt1d.pfrt_fit_eis(*eis_data, **fit_kw)
                elif freq is None:
                    self.drt1d.pfrt_fit_chrono(*chrono_data, **fit_kw)
                else:
                    self.drt1d.pfrt_fit_hybrid(*chrono_data, *eis_data, **fit_kw)
            elif times is None:
                self.drt1d.fit_eis(*eis_data, **self.fit_kw)
            elif freq is None:
                self.drt1d.fit_chrono(*chrono_data, **self.fit_kw)
            else:
                self.drt1d.fit_hybrid(*chrono_data, *eis_data, **self.fit_kw)

            self.obs_fit_attr[obs_index] = self.drt1d.get_attributes(
                which=self.store_attr_categories)
            self.obs_llh[obs_index] = self.drt1d.evaluate_llh()
            self.obs_rss[obs_index] = self.drt1d.evaluate_rss()

            left_index = nearest_index(self.tau_supergrid, self.drt1d.basis_tau[0])
            right_index = nearest_index(self.tau_supergrid, self.drt1d.basis_tau[-1]) + 1
            self.obs_tau_indices[obs_index] = (left_index, right_index)

            if self.obs_special is None:
                self.initialize_obs_special()

            x_drt, x_special = self.format_1d_params(self.drt1d, left_index, right_index)
            if not np.all(np.isfinite(x_drt)):
                raise ValueError("Fit produced non-finite DRT coefficients")
            self.obs_x[obs_index] = x_drt
            drt_cov = self.drt1d.estimate_distribution_cov(tau=self.tau_supergrid,
                                                           extend_var=True)
            if drt_cov is not None:
                self.obs_drt_var[obs_index] = np.diag(drt_cov)
            for key in self.drt1d.special_qp_params:
                if key not in self.obs_special:
                    shape = (self.num_obs, *self.special_param_shape(key))
                    self.obs_special[key] = np.zeros(shape)
                    self.obs_special_resolved[key] = np.zeros(shape)
                    self.obs_special_filt[key] = np.zeros(shape)
                self.obs_special[key][obs_index] = x_special[key]
            self.obs_fit_status[obs_index] = True
        except Exception as err:
            if ignore_errors:
                print(f"Error at obs_index {obs_index}; observation ignored.\n{err}")
                self.obs_fit_status[obs_index] = False
                self.obs_ignore_flag[obs_index] = True
                self.obs_fit_errors[obs_index] = err
            else:
                raise

    def fit_observations(self, obs_index, print_interval=None, ignore_errors=False):
        num_to_fit = len(obs_index)
        if print_interval is None:
            print_interval = int(np.ceil(num_to_fit / 10)) if num_to_fit else 1
        start_time = time.time()
        for i, index in enumerate(obs_index):
            self.fit_observation(index, ignore_errors=ignore_errors)
            if self.print_progress and ((i + 1) % print_interval == 0 or i == num_to_fit - 1):
                print(f"{i + 1} / {num_to_fit}")
        if num_to_fit > 0 and self.print_progress:
            elapsed = time.time() - start_time
            print("Fitted {} observations in {:.1f} s ({:.2f} s/obs)".format(
                num_to_fit, elapsed, elapsed / num_to_fit))

    def fit_all(self, refit=False, print_interval=None, ignore_errors=False,
                batched=False, mesh=None, dtype=None):
        """Fit all (unfitted) observations.

        With batched=True, requires all observations to be EIS spectra on a
        single shared frequency grid; runs one vmapped sharded computation.
        """
        if refit:
            fit_index = np.arange(self.num_obs)
        else:
            fit_index = np.where(~self.obs_fit_status & ~self.obs_ignore_flag)[0]
        if batched:
            self._fit_batched(fit_index, mesh=mesh, dtype=dtype,
                              ignore_errors=ignore_errors)
        else:
            self.fit_observations(fit_index, print_interval, ignore_errors)

    def _fit_batched(self, fit_index, mesh=None, dtype=None, ignore_errors=False):
        """TPU fast path: vmapped, mesh-sharded fits over all observations.

        Observations are partitioned by data type (EIS / hybrid / chrono).
        Groups that share one measurement grid use the shared-matrix fitters
        (BatchedEISFitter / BatchedHybridFitter -- one design matrix for the
        whole batch); heterogeneous groups (per-observation frequency grids,
        chrono protocols, basis windows) run through the padded + masked
        ragged fitter (hybdrt_tpu.parallel.ragged). The reference fits all of
        these serially (reference drtmd.py:303-319)."""
        if len(fit_index) == 0:
            return
        fit_index = np.asarray(fit_index)
        chronos, eiss, types = [], [], []
        for i in fit_index:
            chrono_data, eis_data = self.get_obs_data(i)
            has_c = chrono_data is not None and chrono_data[0] is not None
            has_e = eis_data is not None and eis_data[0] is not None
            if not (has_c or has_e):
                raise ValueError(f"Observation {i} has no data")
            chronos.append(chrono_data)
            eiss.append(eis_data)
            types.append("hybrid" if (has_c and has_e)
                         else ("eis" if has_e else "chrono"))
        types = np.array(types)

        if self.fit_type == "pfrt":
            if not np.all(types == "eis"):
                raise ValueError("Batched pfrt fitting supports EIS-only "
                                 "observations")
            # Partition by frequency grid: each shared-grid group runs as
            # one vmapped sweep (mixed-grid maps no longer raise)
            groups = {}
            for bi, e in enumerate(eiss):
                f_k = np.asarray(e[0])
                groups.setdefault(f_k.tobytes(), []).append(bi)
            for members in groups.values():
                f0 = np.asarray(eiss[members[0]][0])
                z_batch = np.stack([np.asarray(eiss[bi][1])
                                    for bi in members])
                self._fit_batched_pfrt(fit_index[members], f0, z_batch,
                                       mesh=mesh, dtype=dtype)
            return

        for type_name in ("eis", "hybrid", "chrono"):
            sel = types == type_name
            if not sel.any():
                continue
            idx = fit_index[sel]
            sub_c = [c for c, s in zip(chronos, sel) if s]
            sub_e = [e for e, s in zip(eiss, sel) if s]
            # The shared-matrix hybrid fitter implements only the default
            # (None) weight-factor configuration; other settings route to
            # the ragged fitter, which resolves them per observation
            wf_default = (self.fit_kw.get("hybrid_weight_factor_method") is None
                          and self.fit_kw.get("eis_weight_factor") is None
                          and self.fit_kw.get("chrono_weight_factor") is None
                          # BatchedHybridFitter supports neither DOP nor
                          # capacitance; such configs go through the ragged
                          # fitter, which assembles the full serial system
                          and not self.fit_dop and not self.fit_capacitance)
            if type_name == "eis" and self._eis_grid_uniform(sub_e):
                self._fit_batched_eis_uniform(idx, sub_e, mesh=mesh, dtype=dtype,
                                              ignore_errors=ignore_errors)
            elif type_name == "hybrid" and wf_default \
                    and self._hybrid_protocol_uniform(sub_c, sub_e):
                self._fit_batched_hybrid_uniform(idx, sub_c, sub_e, mesh=mesh,
                                                 dtype=dtype,
                                                 ignore_errors=ignore_errors)
            else:
                self._fit_batched_ragged(idx, sub_c, sub_e, mesh=mesh, dtype=dtype,
                                         ignore_errors=ignore_errors)

    def _batched_obs_failure(self, obs_index, reason, ignore_errors):
        """Per-observation failure handling for batched fits: the batched
        analog of fit_observation(ignore_errors=True) (reference
        drtmd.py:303-319 catches per-obs exceptions in the serial loop; in a
        vmapped fit a failed spectrum surfaces as non-finite output instead)."""
        err = ValueError(reason)
        if ignore_errors:
            print(f"Error at obs_index {obs_index}; observation ignored.\n{err}")
            self.obs_fit_status[obs_index] = False
            self.obs_ignore_flag[obs_index] = True
            self.obs_fit_errors[obs_index] = err
            return
        raise err

    @staticmethod
    def _eis_grid_uniform(eiss):
        f0 = np.asarray(eiss[0][0])
        return all(len(np.asarray(e[0])) == len(f0) and np.allclose(e[0], f0)
                   for e in eiss[1:])

    @staticmethod
    def _hybrid_protocol_uniform(chronos, eiss):
        if not DRTMD._eis_grid_uniform(eiss):
            return False
        t0 = np.asarray(chronos[0][0])
        i0 = np.asarray(chronos[0][1])
        return all(len(np.asarray(c[0])) == len(t0) and np.allclose(c[0], t0)
                   and np.allclose(c[1], i0) for c in chronos[1:])

    def _fit_batched_eis_uniform(self, fit_index, eiss, mesh=None, dtype=None,
                                 ignore_errors=False):
        f0 = np.asarray(eiss[0][0])
        z_batch = np.stack([np.asarray(e[1]) for e in eiss])
        fitter = self._eis_fitter(f0, dtype=dtype, mesh=mesh)
        result = fitter.fit(z_batch, **self._split_batch_kw()[1])
        self._batch_fitter = fitter
        self._register_batch_fitter("eis", fitter)
        rzv_batch, _ = fitter.scale_batch(z_batch)
        self._store_uniform_result(fit_index, fitter, result, z_batch,
                                   rzv_batch, is_hybrid=False,
                                   ignore_errors=ignore_errors)

    def _fit_batched_hybrid_uniform(self, fit_index, chronos, eiss, mesh=None,
                                    dtype=None, ignore_errors=False):
        f0 = np.asarray(eiss[0][0])
        z_batch = np.stack([np.asarray(e[1]) for e in eiss])
        t0 = np.asarray(chronos[0][0])
        i0 = np.asarray(chronos[0][1])
        v_batch = np.stack([np.asarray(c[2]) for c in chronos])
        fitter = self._hybrid_fitter(t0, i0, f0, dtype=dtype, mesh=mesh)
        result = fitter.fit(v_batch, z_batch, **self._split_batch_kw()[1])
        self._batch_fitter = fitter
        self._register_batch_fitter("hybrid", fitter)
        rzv_batch, _ = fitter.scale_batch(v_batch, z_batch)
        self._store_uniform_result(fit_index, fitter, result, z_batch,
                                   rzv_batch, is_hybrid=True,
                                   ignore_errors=ignore_errors)

    def _register_batch_fitter(self, key, fitter):
        """Keep one fitter per batched group so multi-group fit_all calls
        (EIS + hybrid) can each rebuild their own observations."""
        if not hasattr(self, "_batch_fitters"):
            self._batch_fitters = {}
        self._batch_fitters[key] = fitter

    # batch_fit_kw keys consumed by the shared-grid fitters' fit() calls
    # rather than their constructors (see batch_fit_kw comment in __init__)
    _SCHEDULE_KEYS = ("adaptive", "phase_budgets", "staged_capacities")

    def _split_batch_kw(self):
        """(constructor kwargs, fit-call scheduling kwargs) from batch_fit_kw."""
        ctor = {k: v for k, v in self.batch_fit_kw.items()
                if k not in self._SCHEDULE_KEYS}
        sched = {k: v for k, v in self.batch_fit_kw.items()
                 if k in self._SCHEDULE_KEYS}
        return ctor, sched

    def _batch_kw_sig(self):
        """Hashable signature of batch_fit_kw for the fitter cache key."""
        def scalar(x):
            return isinstance(x, (str, int, float, bool, type(None)))

        def prim(v):
            if isinstance(v, (list, tuple)):  # flat sequences only
                return all(scalar(x) for x in v)
            return scalar(v)

        kw = self.batch_fit_kw
        if all(prim(v) for v in kw.values()):
            return tuple(sorted(
                ((k, tuple(v) if isinstance(v, (list, tuple)) else v)
                 for k, v in kw.items()), key=lambda kv: kv[0]))
        return _UNCACHEABLE  # non-primitive values: opt the key out of caching

    def _struct_sig(self):
        """Structural model configuration consumed by the batched-fitter
        constructors. Part of every fitter cache key: mutating e.g. fit_dop
        between fit_all calls must invalidate the cached fitters, which were
        assembled from the old attributes."""
        return (self.tau_supergrid is not None
                and np.asarray(self.tau_supergrid, dtype=float).tobytes(),
                bool(self.fit_ohmic), bool(self.fit_inductance),
                bool(self.fit_capacitance), bool(self.fit_dop),
                str(self.step_model), str(self.chrono_mode),
                None if self.fixed_basis_nu is None
                else np.asarray(self.fixed_basis_nu, dtype=float).tobytes())

    def _cached_fitter(self, key, factory):
        """Reuse batched-fitter instances across fit_all calls.

        Each fitter caches its jitted entry point and per-protocol prep
        systems on the instance; a fresh instance per call would re-trace
        and re-load the compiled executable (~10 s on a 1-vCPU host even
        with the persistent compile cache) on every incremental fit_all of
        a growing map. Keys containing _UNCACHEABLE (non-primitive fit
        kwargs) build a fresh fitter and are NOT stored — inserting them
        would retain one unreachable fitter per call. Not persisted (see
        _persist_attrs)."""
        if any(k is _UNCACHEABLE for k in key):
            return factory()
        cache = getattr(self, "_fitter_cache", None)
        if cache is None:
            cache = self._fitter_cache = {}
        fitter = cache.get(key)
        if fitter is None:
            fitter = cache[key] = factory()
        return fitter

    def _eis_fitter(self, f0, dtype=None, mesh=None):
        """Shared-grid EIS fitter for this map's configuration (cached).

        Used by the uniform-EIS, batched-PFRT, and pfrt-covariance-rebuild
        paths — all construct the identical fitter, so they share one cache
        entry (one set of device matrices + jitted entries)."""
        import jax.numpy as jnp
        from ..parallel.batch import BatchedEISFitter
        f0 = np.asarray(f0)
        # Normalize the key's dtype component: dtype=None resolves to f64 in
        # the factory, so None and an explicit float64 must share one entry
        dtype_key = str(jnp.dtype(dtype if dtype is not None else jnp.float64))
        ctor_kw, _ = self._split_batch_kw()
        return self._cached_fitter(
            ("eis", f0.tobytes(), dtype_key,
             id(mesh) if mesh is not None else None,
             bool(self.fit_kw.get("nonneg", True)), self._batch_kw_sig(),
             self._struct_sig()),
            lambda: BatchedEISFitter(
                f0, tau_supergrid=self.tau_supergrid, fit_ohmic=self.fit_ohmic,
                fit_inductance=self.fit_inductance,
                fit_capacitance=self.fit_capacitance,
                fit_dop=self.fit_dop, nonneg=self.fit_kw.get("nonneg", True),
                dtype=dtype if dtype is not None else jnp.float64, mesh=mesh,
                **ctor_kw))

    def _hybrid_fitter(self, t0, i0, f0, dtype=None, mesh=None):
        """Shared-protocol hybrid fitter for this map's configuration
        (cached; the hybrid analog of _eis_fitter)."""
        import jax.numpy as jnp
        from ..parallel.batch import BatchedHybridFitter
        t0 = np.asarray(t0, dtype=float)
        i0 = np.asarray(i0, dtype=float)
        f0 = np.asarray(f0, dtype=float)
        # Normalize the key's dtype component: dtype=None resolves to f64 in
        # the factory, so None and an explicit float64 must share one entry
        dtype_key = str(jnp.dtype(dtype if dtype is not None else jnp.float64))
        ctor_kw, _ = self._split_batch_kw()
        return self._cached_fitter(
            ("hybrid", t0.tobytes(), i0.tobytes(), f0.tobytes(), dtype_key,
             id(mesh) if mesh is not None else None,
             bool(self.fit_kw.get("nonneg", True)), self._batch_kw_sig(),
             self._struct_sig()),
            lambda: BatchedHybridFitter(
                t0, i0, f0, tau_supergrid=self.tau_supergrid,
                fit_ohmic=self.fit_ohmic, fit_inductance=self.fit_inductance,
                nonneg=self.fit_kw.get("nonneg", True),
                dtype=dtype if dtype is not None else jnp.float64, mesh=mesh,
                **ctor_kw))

    def _store_uniform_result(self, fit_index, fitter, result, z_batch,
                              rzv_batch, is_hybrid, ignore_errors=False):
        # Locate the shared basis window on the supergrid
        left_index = nearest_index(self.tau_supergrid, fitter.basis_tau[0])
        right_index = nearest_index(self.tau_supergrid, fitter.basis_tau[-1]) + 1

        template = fitter.template
        self.drt1d.set_attributes(template.get_attributes(["config", "fit_core"]))
        if self.obs_special is None:
            # Temporarily borrow the template's special params for shapes
            self.drt1d.special_qp_params = template.special_qp_params
            self.initialize_obs_special()

        for bi, i in enumerate(fit_index):
            if not (np.all(np.isfinite(result.x[bi]))
                    and np.isfinite(result.r_inf[bi])):
                self._batched_obs_failure(
                    i, "Batched fit produced non-finite coefficients",
                    ignore_errors)
                continue
            self.obs_x[i, left_index:right_index] = result.x[bi]
            self.obs_tau_indices[i] = (left_index, right_index)
            if "R_inf" in self.obs_special:
                self.obs_special["R_inf"][i] = result.r_inf[bi]
            if "inductance" in self.obs_special:
                self.obs_special["inductance"][i] = result.inductance[bi]
            if "C_inv" in self.obs_special:
                self.obs_special["C_inv"][i] = result.c_inv[bi]
            if "x_dop" in self.obs_special and result.x_dop is not None:
                self.obs_special["x_dop"][i] = result.x_dop[bi]
            # Store the per-observation state needed to rebuild (P, q) lazily
            self.obs_fit_attr[i] = {
                "batched": True, "x_raw": result.x_raw[bi],
                "scale": result.scale[bi], "weights": result.weights[bi],
                "rho": result.rho[bi], "s_vectors": result.s_vectors[bi],
                "z": z_batch[bi], "rzv": np.asarray(rzv_batch[bi]),
                "fitter_key": "hybrid" if is_hybrid else "eis",
                "converged": bool(result.converged[bi]),
                "n_iter": int(result.n_iter[bi]),
            }
            self.obs_fit_status[i] = True

        # Weighted scaled-space rss/llh, matching what the serial and ragged
        # paths store (the raw data-space residual is NOT comparable). For
        # hybrid fits the model response includes the final vz-offset column
        # rewrite (solver/fitcore.py:119-126).
        from scipy.special import gammaln as _gammaln
        rzm = np.asarray(fitter.rzm)
        x_raw = np.asarray(result.x_raw)
        y_hat = x_raw @ rzm.T
        if is_hybrid and getattr(fitter, "vz_index", -1) >= 0:
            nc = fitter.num_chrono
            y_sep = x_raw @ np.asarray(fitter.rzm_vz).T
            y_sep[:, nc:] *= -1.0
            strength = np.asarray(fitter.vz_strength_vec)
            y_hat = y_hat + x_raw[:, [fitter.vz_index]] * y_sep                 * strength[None, :]
        rzv = np.asarray(rzv_batch)
        wr = np.asarray(result.weights) * (y_hat - rzv)
        rss = np.sum(wr ** 2, axis=1)
        n_data = rzv.shape[1]
        alpha_n = 2.0 - 1 + n_data / 2
        beta_n = 1.0 + 0.5 * rss
        llh = (-alpha_n * np.log(beta_n) + _gammaln(alpha_n) - _gammaln(2.0)
               + np.sum(np.log(np.maximum(np.asarray(result.weights), 1e-300)),
                        axis=1))
        ok = self.obs_fit_status[fit_index]
        self.obs_rss[fit_index[ok]] = rss[ok]
        self.obs_llh[fit_index[ok]] = llh[ok]

    def _fit_batched_ragged(self, fit_index, chronos, eiss, mesh=None, dtype=None,
                            ignore_errors=False):
        """Heterogeneous batch: per-observation grids/protocols/windows padded
        and masked into one vmapped fit (hybdrt_tpu.parallel.ragged)."""
        import jax.numpy as jnp
        from ..parallel.ragged import BatchedRaggedFitter
        from ..solver import qphb as qphb_mod

        fit_kw = {k: v for k, v in self.fit_kw.items() if k != "nonneg"}
        fitter = self._cached_fitter(
            ("ragged", None if dtype is None else str(dtype),
             id(mesh) if mesh is not None else None,
             bool(self.fit_kw.get("nonneg", True)), self._batch_kw_sig(),
             self._struct_sig(),
             # Non-primitive fit_kw values can't be keyed: the sentinel opts
             # this call out of caching entirely (fresh fitter, never stored)
             tuple(sorted(fit_kw.items(), key=lambda kv: kv[0]))
             if all(isinstance(v, (str, int, float, bool, type(None)))
                    for v in fit_kw.values()) else _UNCACHEABLE),
            lambda: BatchedRaggedFitter(
                self.tau_supergrid, fit_ohmic=self.fit_ohmic,
                fit_inductance=self.fit_inductance,
                fit_capacitance=self.fit_capacitance, fit_dop=self.fit_dop,
                nonneg=self.fit_kw.get("nonneg", True),
                dtype=dtype if dtype is not None else jnp.float64, mesh=mesh,
                step_model=self.step_model, chrono_mode=self.chrono_mode,
                fixed_basis_nu=self.fixed_basis_nu, fit_kw=fit_kw,
                **self._split_batch_kw()[0]))
        observations = list(zip(chronos, eiss))
        # Scheduling keys (adaptive/phase_budgets/staged_capacities) apply to
        # the ragged fitter too: adaptive="staged" runs the single-dispatch
        # compacted-continuation schedule (parallel/ragged.py _fit_staged)
        result = fitter.fit(observations, **self._split_batch_kw()[1])
        self._ragged_fitter = fitter

        if self.obs_special is None:
            self.drt1d.special_qp_params = fitter.special_qp_params
            self.initialize_obs_special()

        ns = fitter.cfg.num_special
        # Scaled-space weighted llh/rss from the padded batch arrays (the
        # serial path stores drt1d.evaluate_llh()/evaluate_rss())
        from scipy.special import gammaln as _gammaln
        batch = fitter._last_batch
        # Per-protocol prediction: avoids gathering the (B, R, N) design
        # stack on the host (parallel/ragged.py:final_predictions)
        y_hat = fitter.final_predictions(result)
        row_mask = fitter.full("row_mask")
        wr = result.weights * (y_hat - batch["rzv"]) * row_mask
        rss = np.sum(wr ** 2, axis=1)
        n_data = row_mask.sum(axis=1)
        alpha_n = 2.0 - 1 + n_data / 2
        beta_n = 1.0 + 0.5 * rss
        llh = (-alpha_n * np.log(beta_n) + _gammaln(alpha_n) - _gammaln(2.0)
               + np.sum(row_mask * np.log(np.maximum(result.weights, 1e-300)),
                        axis=1))

        for bi, i in enumerate(fit_index):
            li, ri = result.tau_indices[bi]
            w_i = ri - li
            if not (np.all(np.isfinite(result.x[bi][:w_i]))
                    and np.isfinite(result.r_inf[bi])):
                self._batched_obs_failure(
                    i, "Batched ragged fit produced non-finite coefficients",
                    ignore_errors)
                continue
            self.obs_x[i, li:ri] = result.x[bi][:w_i]
            self.obs_tau_indices[i] = (li, ri)
            if "R_inf" in self.obs_special:
                self.obs_special["R_inf"][i] = result.r_inf[bi]
            if "inductance" in self.obs_special:
                self.obs_special["inductance"][i] = result.inductance[bi]
            if "C_inv" in self.obs_special:
                self.obs_special["C_inv"][i] = result.c_inv[bi]
            if "x_dop" in self.obs_special and result.x_dop is not None:
                self.obs_special["x_dop"][i] = result.x_dop[bi]
            n_i = int(result.num_rows[bi])
            self.obs_fit_attr[i] = {
                "batched": True, "ragged": True,
                "x_raw": result.x_raw[bi][:ns + w_i],
                "scale": result.scale[bi],
                "weights": result.weights[bi][:n_i],
                "rho": result.rho[bi],
                "s_vectors": result.s_vectors[bi][:, :ns + w_i],
                "chrono_data": chronos[bi], "eis_data": eiss[bi],
                "converged": bool(result.converged[bi]),
                "n_iter": int(result.n_iter[bi]),
            }
            self.obs_rss[i] = rss[bi]
            self.obs_llh[i] = llh[bi]
            self.obs_fit_status[i] = True

    def _fit_batched_pfrt(self, fit_index, f0, z_batch, mesh=None, dtype=None):
        """Batched PFRT sweep over all EIS observations: one vmapped
        computation per batch (BatchedEISFitter.pfrt_fit)."""
        fitter = self._eis_fitter(f0, dtype=dtype, mesh=mesh)
        step_x, step_llh, scale, step_state = fitter.pfrt_fit(
            z_batch, factors=self.pfrt_factors, return_step_state=True)
        self._batch_fitter = fitter
        self._register_batch_fitter("pfrt", fitter)

        left_index = nearest_index(self.tau_supergrid, fitter.basis_tau[0])
        right_index = nearest_index(self.tau_supergrid, fitter.basis_tau[-1]) + 1
        template = fitter.template
        self.drt1d.set_attributes(template.get_attributes(["config", "fit_core"]))
        if self.obs_special is None:
            self.drt1d.special_qp_params = template.special_qp_params
            self.initialize_obs_special()

        ns = fitter.num_special
        sp = template.special_qp_params
        for bi, i in enumerate(fit_index):
            self.obs_x[i, :, left_index:right_index] = step_x[bi, :, ns:] * scale[bi]
            self.obs_tau_indices[i] = (left_index, right_index)
            for key, info in sp.items():
                if key in self.obs_special:
                    col_scale = {"inductance": template.inductance_scale or 1.0,
                                 "C_inv": template.capacitance_scale or 1.0}.get(key, 1.0)
                    self.obs_special[key][i] = step_x[bi, :, info["index"]]                         * scale[bi] * col_scale
            self.obs_llh[i] = float(np.max(step_llh[bi]))
            self.obs_fit_attr[i] = {"batched": True, "pfrt": True,
                                    "step_x_raw": step_x[bi],
                                    "step_llh": step_llh[bi],
                                    "step_rho": step_state["rho"][bi],
                                    "step_s": step_state["s_vectors"][bi],
                                    "step_dop_rho": step_state["dop_rho"][bi],
                                    "scale": scale[bi], "z": z_batch[bi]}
            self.obs_fit_status[i] = True

    def get_fit(self, obs_index):
        """Reconstruct a DRT instance holding the fit of one observation."""
        if not self.obs_fit_status[obs_index]:
            raise ValueError(f"Observation {obs_index} has not been fitted")
        attr = self.obs_fit_attr[obs_index]
        if isinstance(attr, dict) and attr.get("batched"):
            return self._rebuild_batched_fit(obs_index, attr)
        drt = DRT(interpolate_integrals=False)
        drt.set_attributes(attr)
        drt.interpolate_lookups = self.drt1d.interpolate_lookups
        drt.integrate_method = "interp"
        return drt

    def _resolve_batch_fitter(self, obs_index, attr):
        """Shared-grid fitter for a uniform-batched observation: the live
        instance from this session's fit_all, or (reloaded instance) one
        rebuilt from the stored configuration and the observation's
        measurement grids (mirrors _rebuild_ragged_fit)."""
        fitter = getattr(self, "_batch_fitters", {}).get(
            attr.get("fitter_key")) or getattr(self, "_batch_fitter", None)
        if fitter is not None and not self._fitter_matches_obs(
                fitter, obs_index, attr):
            # A later fit_all on a different measurement grid overwrote the
            # registered fitter for this key; rebuild from this observation's
            # own grids instead of silently using the wrong design matrices
            fitter = None
        if fitter is None:
            import jax.numpy as jnp
            chrono_data, eis_data = self.get_obs_data(obs_index)
            # batch_fit_kw carries hyper overrides (rp_scale, iw_*_lambda_0,
            # ...) that shape the template hypers and hence P; omitting it
            # here would rebuild covariance under DEFAULT hypers after a
            # save/load round trip (the cached constructors forward it; it is
            # in _persist_attrs for this reason)
            if attr.get("fitter_key") == "hybrid":
                times, i_sig, _ = chrono_data
                fitter = self._hybrid_fitter(times, i_sig, eis_data[0],
                                             dtype=jnp.float64)
            else:
                fitter = self._eis_fitter(eis_data[0], dtype=jnp.float64)
        return fitter

    def _uniform_group_key(self, obs_index):
        """Group key for a successfully uniform-batched observation, or None
        if it must go through the per-obs path (serial, ragged, pfrt, or
        failed/unfitted — get_fit raises for those rather than silently
        rebuilding from a stale pre-failure attr).

        The key includes the measurement-protocol signature, not just the
        fitter kind: successive fit_all calls on different grids store the
        same fitter_key but need different design matrices."""
        if not self.obs_fit_status[obs_index]:
            return None
        attr = self.obs_fit_attr[obs_index]
        if not (isinstance(attr, dict) and attr.get("batched")) \
                or attr.get("ragged") or attr.get("pfrt"):
            return None
        return (attr.get("fitter_key"), self._obs_grid_sig(obs_index))

    def _obs_grid_sig(self, obs_index):
        """Hashable signature of an observation's measurement protocol
        (chrono times/input + EIS frequencies)."""
        chrono_data, eis_data = self.get_obs_data(obs_index)
        parts = []
        if chrono_data is not None and chrono_data[0] is not None:
            parts.append(np.asarray(chrono_data[0], dtype=float).tobytes())
            parts.append(np.asarray(chrono_data[1], dtype=float).tobytes())
        if eis_data is not None and eis_data[0] is not None:
            parts.append(np.asarray(eis_data[0], dtype=float).tobytes())
        return tuple(parts)

    def _fitter_matches_obs(self, fitter, obs_index, attr):
        """True if a registered shared-grid fitter was built on this
        observation's measurement protocol. A later fit_all on a different
        grid overwrites the per-key registration, so the grids must be
        re-checked before rebuilding (P, q) against the fitter's design
        matrices."""
        is_hybrid_fitter = hasattr(fitter, "times")
        if is_hybrid_fitter != (attr.get("fitter_key") == "hybrid"):
            return False
        chrono_data, eis_data = self.get_obs_data(obs_index)
        freq = None if eis_data is None else eis_data[0]
        if freq is None:
            return False  # uniform-batched fits always carry EIS rows
        freq = np.asarray(freq, dtype=float)
        if len(freq) != len(fitter.frequencies) \
                or not np.allclose(freq, fitter.frequencies):
            return False
        if attr.get("fitter_key") == "hybrid":
            times = np.asarray(chrono_data[0], dtype=float)
            i_sig = np.asarray(chrono_data[1], dtype=float)
            return (len(times) == len(fitter.times)
                    and np.allclose(times, fitter.times)
                    and np.allclose(i_sig, fitter.i_signal))
        return True

    @staticmethod
    def _uniform_attr_rzv(attr):
        if attr.get("rzv") is not None:
            return np.asarray(attr["rzv"])  # scaled rows incl. chrono block
        # attrs stored before rzv was recorded (EIS-only batches)
        return np.concatenate([attr["z"].real, attr["z"].imag]) / attr["scale"]

    def _uniform_pq(self, fitter, attrs):
        """(P, q) for uniform-batched observations on one fitter, rebuilt as
        ONE vmapped calculate_pq (a per-observation call costs one tunneled
        device dispatch each). Returns host (B, N, N), (B, N)."""
        import jax
        import jax.numpy as jnp
        from ..solver import qphb as qphb_mod
        from ..models.drt import _hypers_to_pytree
        from ..utils.device import host_cpu

        qp = fitter.template.qphb_params
        cfg = qp["cfg"]
        k_range = cfg.k_range
        m_stack = np.stack([np.asarray(qp["penalty_matrices"][f"m{k}"],
                                       dtype=float) for k in range(k_range)])
        hyp = _hypers_to_pytree(qp["hypers"])
        rzv_b = np.stack([self._uniform_attr_rzv(a) for a in attrs])
        rho_b = np.stack([np.asarray(a["rho"], dtype=float) for a in attrs])
        s_b = np.stack([np.asarray(a["s_vectors"], dtype=float)
                        for a in attrs])
        w_b = np.stack([np.asarray(a["weights"], dtype=float) for a in attrs])
        with host_cpu():
            def pq_one(rzv_i, rho_i, s_i, w_i):
                return qphb_mod.calculate_pq(
                    jnp.asarray(np.asarray(qp["rm"], dtype=float)), rzv_i,
                    jnp.asarray(m_stack), hyp,
                    jnp.asarray(np.asarray(qp["l1_lambda_vector"],
                                           dtype=float)),
                    rho_i, jnp.ones(k_range), s_i, w_i, cfg)
            p_b, q_b = jax.vmap(pq_one)(
                jnp.asarray(rzv_b), jnp.asarray(rho_b), jnp.asarray(s_b),
                jnp.asarray(w_b))
        return np.asarray(p_b), np.asarray(q_b)

    def _make_uniform_drt(self, fitter, attr, p_matrix, q_vector):
        """Lightweight DRT carrying this observation's (P, q)."""
        template = fitter.template
        drt = DRT(interpolate_integrals=False)
        drt.set_attributes(template.get_attributes(["config", "fit_core"]))
        # The template's qphb_params belong to its placeholder fit; drop them
        # so covariance estimation uses THIS observation's (P, q) below
        drt.qphb_params = None
        drt.interpolate_lookups = self.drt1d.interpolate_lookups
        drt.integrate_method = "interp"
        drt.coefficient_scale = attr["scale"]
        drt.impedance_scale = attr["scale"]
        drt.fit_parameters = drt.extract_qphb_parameters(attr["x_raw"])
        drt.fit_parameters["p_matrix"] = np.asarray(p_matrix)
        drt.fit_parameters["q_vector"] = np.asarray(q_vector)
        return drt

    def _rebuild_batched_fit(self, obs_index, attr):
        """Build a lightweight DRT carrying (P, q) from stored batched state."""
        if attr.get("ragged"):
            return self._rebuild_ragged_fit(obs_index, attr)
        if attr.get("pfrt"):
            return self._rebuild_batched_pfrt_fit(obs_index, attr)
        fitter = self._resolve_batch_fitter(obs_index, attr)
        p_b, q_b = self._uniform_pq(fitter, [attr])
        return self._make_uniform_drt(fitter, attr, p_b[0], q_b[0])

    def get_fits_batched(self, obs_index):
        """{i: DRT} for many observations, rebuilding all uniform-batched
        (P, q) systems in one vmapped computation per fitter group instead
        of one device dispatch per observation (the resolve path needs every
        observation's rebuilt fit up front)."""
        obs_index = np.atleast_1d(obs_index)
        out = {}
        groups = {}
        ragged_idx = []
        for i in obs_index:
            key = self._uniform_group_key(i)
            if key is not None:
                groups.setdefault(key, []).append(i)
            elif (self.obs_fit_status[i]
                  and isinstance(self.obs_fit_attr[i], dict)
                  and self.obs_fit_attr[i].get("batched")
                  and self.obs_fit_attr[i].get("ragged")):
                ragged_idx.append(i)
            else:
                out[i] = self.get_fit(i)
        for idx in groups.values():
            attrs = [self.obs_fit_attr[i] for i in idx]
            fitter = self._resolve_batch_fitter(idx[0], attrs[0])
            p_b, q_b = self._uniform_pq(fitter, attrs)
            for bi, i in enumerate(idx):
                out[i] = self._make_uniform_drt(fitter, attrs[bi],
                                                p_b[bi], q_b[bi])
        if ragged_idx:
            # Ragged-batched observations: one vmapped host-CPU (P, q)
            # rebuild per protocol instead of one tunneled device dispatch
            # per observation (_ragged_pq_batched)
            attrs = [self.obs_fit_attr[i] for i in ragged_idx]
            systems, p_list, q_list = self._ragged_pq_batched(attrs)
            for k, i in enumerate(ragged_idx):
                out[i] = self._make_ragged_drt(systems[k], attrs[k],
                                               p_list[k], q_list[k])
        return out

    def _rebuild_batched_pfrt_fit(self, obs_index, attr):
        """Build a DRT carrying the full pfrt sweep — including per-step
        posterior precision P, rebuilt on demand — for a batched-pfrt
        observation.

        The all-device sweep stores only the per-step hyperparameter state
        (x, llh, rho, s, dop_rho); each step's P is recomputed here exactly
        as the serial path records it (models/drt.py record_step): weights
        re-estimated from the step's x, then qphb.calculate_pq under the
        step's factor-scaled hypers. Parity: the reference can always
        produce estimate_param_cov from any fit
        (hybdrt/models/drt1d.py:4116-4146)."""
        if "step_rho" not in attr:
            raise ValueError(
                "This batched-pfrt observation was fitted before per-step "
                "hyperparameter state was stored; refit with fit_all to "
                "enable covariance reconstruction")
        import jax.numpy as jnp
        from ..solver import qphb as qphb_mod
        from ..models.drt import _hypers_to_pytree

        from ..parallel.batch import BatchedEISFitter

        chrono_data, eis_data = self.get_obs_data(obs_index)
        freq = np.asarray(eis_data[0], dtype=float)
        # Only the pfrt-registered fitter is trustworthy here: _batch_fitter
        # may hold e.g. a BatchedHybridFitter from a later fit_all whose
        # template has hybrid-shaped rm/vmm (a frequency check alone would
        # accept it). Fall back to the cached f64 EIS fitter for this grid.
        fitter = getattr(self, "_batch_fitters", {}).get("pfrt")
        if not isinstance(fitter, BatchedEISFitter) \
                or len(fitter.frequencies) != len(freq) \
                or not np.allclose(fitter.frequencies, freq):
            fitter = self._eis_fitter(freq)
        template = fitter.template
        qp = template.qphb_params
        k_range = qp["cfg"].k_range
        m_stack = np.stack([qp["penalty_matrices"][f"m{k}"]
                            for k in range(k_range)])
        rzv = np.concatenate([attr["z"].real, attr["z"].imag]) / attr["scale"]
        factors = np.asarray(self.pfrt_factors, dtype=float)
        hypers = qp["hypers"]
        s0_base = np.asarray(hypers["s_0"], dtype=float)
        l2_base = float(hypers["l2_lambda_0"])

        step_p, step_hypers = [], []
        for fi, f in enumerate(factors):
            x_f = np.asarray(attr["step_x_raw"][fi], dtype=float)
            weights, _, _ = qphb_mod.estimate_weights(
                jnp.asarray(x_f), jnp.asarray(rzv), jnp.asarray(qp["vmm"]),
                jnp.asarray(qp["rm"]))
            hypers_used = {"s_0": s0_base * f, "l2_lambda_0": l2_base / f}
            hyp_eval = _hypers_to_pytree(dict(hypers, **hypers_used))
            p_matrix, _ = qphb_mod.calculate_pq(
                jnp.asarray(qp["rm"]), jnp.asarray(rzv), jnp.asarray(m_stack),
                hyp_eval, jnp.asarray(qp["l1_lambda_vector"]),
                jnp.asarray(np.asarray(attr["step_rho"][fi], dtype=float)),
                jnp.asarray(np.asarray(attr["step_dop_rho"][fi], dtype=float)),
                jnp.asarray(np.asarray(attr["step_s"][fi], dtype=float)),
                jnp.asarray(np.asarray(weights)), qp["cfg"])
            step_p.append(np.asarray(p_matrix))
            step_hypers.append(hypers_used)

        drt = DRT(interpolate_integrals=False)
        drt.set_attributes(template.get_attributes(["config", "fit_core"]))
        # The template's qphb_params belong to its placeholder fit
        drt.qphb_params = None
        drt.interpolate_lookups = self.drt1d.interpolate_lookups
        drt.integrate_method = "interp"
        drt.coefficient_scale = attr["scale"]
        drt.impedance_scale = attr["scale"]
        best = int(np.argmax(np.asarray(attr["step_llh"])))
        drt.fit_parameters = drt.extract_qphb_parameters(
            np.asarray(attr["step_x_raw"][best], dtype=float))
        drt.fit_parameters["p_matrix"] = step_p[best]
        drt.pfrt_result = {
            "factors": factors,
            "step_x": [np.asarray(x, dtype=float)
                       for x in attr["step_x_raw"]],
            "step_llh": np.asarray(attr["step_llh"], dtype=float),
            "step_p_mat": step_p,
            "step_hypers": step_hypers,
        }
        return drt

    def _get_ragged_fitter(self):
        """The (cached) prep-only ragged fitter used to re-assemble stored
        ragged observations' QP systems."""
        from ..parallel.ragged import BatchedRaggedFitter
        fitter = getattr(self, "_ragged_fitter", None)
        if fitter is None:
            fit_kw = {k: v for k, v in self.fit_kw.items() if k != "nonneg"}
            fitter = BatchedRaggedFitter(
                self.tau_supergrid, fit_ohmic=self.fit_ohmic,
                fit_inductance=self.fit_inductance,
                fit_capacitance=self.fit_capacitance, fit_dop=self.fit_dop,
                nonneg=self.fit_kw.get("nonneg", True),
                step_model=self.step_model, chrono_mode=self.chrono_mode,
                fixed_basis_nu=self.fixed_basis_nu, fit_kw=fit_kw,
                **self._split_batch_kw()[0])
            self._ragged_fitter = fitter
        return fitter

    def _ragged_pq_batched(self, attrs):
        """(P, q) + prep systems for ragged-batched observations, computed
        as ONE vmapped calculate_pq per measurement protocol ON THE HOST
        CPU. The previous per-observation rebuild cost one tunneled device
        dispatch each — measured 85-95 s of a 512-obs coupled group
        resolve's ~100 s wall, vs 0.6 s for the actual warm coupled solve.
        Within a protocol the design/penalty matrices are shared objects
        (ragged prep cache), so only the small per-observation vectors are
        stacked; the hybrid vz-offset column (a function of the final
        iterate, reference drt1d.py:972-979) is set per lane inside the
        vmapped function. Returns (systems, p_list, q_list) aligned with
        ``attrs``."""
        import jax
        import jax.numpy as jnp
        from ..solver import qphb as qphb_mod
        from ..models.drt import _hypers_to_pytree
        from ..utils.device import host_cpu

        fitter = self._get_ragged_fitter()
        # _prep_systems groups cached-protocol observations and rescales
        # each group in one vectorized pass (the serial per-obs loop was
        # 29% of hybrid wall in experiments/hybrid_profile.py)
        systems = fitter._prep_systems(
            [(a["chrono_data"], a["eis_data"]) for a in attrs])
        out_p = [None] * len(attrs)
        out_q = [None] * len(attrs)
        groups = {}
        for k, sys_ in enumerate(systems):
            # Protocol identity: fast-path obs share the cached template's
            # arrays; a data-dependent prep gets its own group of one
            groups.setdefault(
                (id(sys_["rzm"]), id(sys_["hypers"]), sys_["cfg"]),
                []).append(k)
        with host_cpu():
            for ks in groups.values():
                sys0 = systems[ks[0]]
                hyp = _hypers_to_pytree(sys0["hypers"])
                cfg = sys0["cfg"]
                vz = bool(sys0["vz_offset"])
                rzm_base = jnp.asarray(np.asarray(sys0["rzm"], dtype=float))
                m_stack = jnp.asarray(np.asarray(sys0["m_stack"],
                                                 dtype=float))
                l1v = jnp.asarray(np.asarray(sys0["l1_lambda_vector"],
                                             dtype=float))
                ones3 = jnp.ones(3)
                rzv_b = jnp.asarray(np.stack(
                    [np.asarray(systems[k]["rzv"], dtype=float) for k in ks]))
                rho_b = jnp.asarray(np.stack(
                    [np.asarray(attrs[k]["rho"], dtype=float) for k in ks]))
                s_b = jnp.asarray(np.stack(
                    [np.asarray(attrs[k]["s_vectors"], dtype=float)
                     for k in ks]))
                w_b = jnp.asarray(np.stack(
                    [np.asarray(attrs[k]["weights"], dtype=float)
                     for k in ks]))
                if vz:
                    nc = sys0["num_chrono"]
                    sign = np.ones(rzm_base.shape[0])
                    sign[nc:] = -1.0
                    vzcol_b = jnp.asarray(np.stack(
                        [(np.asarray(systems[k]["rzm_vz"])
                          @ np.asarray(attrs[k]["x_raw"])) * sign
                         * np.asarray(systems[k]["vz_strength_vec"])
                         for k in ks]))
                    vz_index = int(sys0["vz_index"])
                else:
                    vzcol_b = jnp.zeros((len(ks), 1))
                    vz_index = 0

                def pq_one(rzv_i, rho_i, s_i, w_i, vzcol_i):
                    rzm_i = (rzm_base.at[:, vz_index].set(vzcol_i)
                             if vz else rzm_base)
                    return qphb_mod.calculate_pq(
                        rzm_i, rzv_i, m_stack, hyp, l1v, rho_i, ones3,
                        s_i, w_i, cfg)

                p_b, q_b = jax.vmap(pq_one)(rzv_b, rho_b, s_b, w_b, vzcol_b)
                p_b, q_b = np.asarray(p_b), np.asarray(q_b)
                for bi, k in enumerate(ks):
                    out_p[k], out_q[k] = p_b[bi], q_b[bi]
        return systems, out_p, out_q

    def _rebuild_ragged_fit(self, obs_index, attr):
        """Build a DRT carrying (P, q) for a ragged-batched observation by
        re-assembling its (cheap, host-side) QP system and combining it with
        the stored final weights/hyperparameters."""
        systems, p_list, q_list = self._ragged_pq_batched([attr])
        return self._make_ragged_drt(systems[0], attr, p_list[0], q_list[0])

    def _make_ragged_drt(self, sys_, attr, p_matrix, q_vector):
        """Lightweight DRT carrying one ragged observation's (P, q)."""
        x_raw = np.asarray(attr["x_raw"])
        drt = DRT(interpolate_integrals=False, tau_supergrid=self.tau_supergrid,
                  tau_basis_type=self.tau_basis_type,
                  fit_inductance=self.fit_inductance, fit_ohmic=self.fit_ohmic,
                  fit_capacitance=self.fit_capacitance, fit_dop=self.fit_dop,
                  fixed_basis_nu=self.fixed_basis_nu,
                  step_model=self.step_model, chrono_mode=self.chrono_mode,
                  warn=False)
        drt.interpolate_lookups = self.drt1d.interpolate_lookups
        drt.integrate_method = "interp"
        drt.basis_tau = sys_["basis_tau"]
        drt.tau_epsilon = self.tau_epsilon
        drt.special_qp_params = sys_["special_qp_params"]
        drt.coefficient_scale = attr["scale"]
        drt.impedance_scale = sys_["impedance_scale"]
        drt.input_signal_scale = sys_["input_signal_scale"]
        drt.response_signal_scale = sys_["response_signal_scale"]
        drt.inductance_scale = sys_["inductance_scale"]
        drt.capacitance_scale = sys_["capacitance_scale"]
        drt.dop_scale_vector = sys_["dop_scale_vector"]
        drt.v_baseline_scale = sys_["v_baseline_scale"]
        drt.scaled_response_offset = sys_["scaled_response_offset"] or 0.0
        drt.fit_parameters = drt.extract_qphb_parameters(x_raw)
        drt.fit_parameters["p_matrix"] = np.asarray(p_matrix)
        drt.fit_parameters["q_vector"] = np.asarray(q_vector)
        return drt

    # ------------------------------------------------------------------
    # Resolution (reference drtmd.py:398-560)
    # ------------------------------------------------------------------
    def get_group_index(self, group_id):
        return np.where(np.array([g == group_id for g in self.obs_group_id]))[0]

    def resolve_observations(self, obs_index, psi_sort_dims=None, psi_distance_dims=None,
                             truncate=False, sigma=1, lambda_psi=1, tau_filter_sigma=0,
                             special_filter_sigma=0):
        if self.fit_type != "drt":
            raise ValueError("resolve_observations supports fit_type='drt' only")
        obs_index = np.asarray(obs_index)
        include = self.obs_fit_status[obs_index] & ~self.obs_ignore_flag[obs_index]
        obs_index = obs_index[include]

        # psi_distance_dims is a sort-key fallback, exactly as the reference
        # treats it (drtmd.py:499-500; distance-WEIGHTED coupling is an
        # unimplemented TODO in the reference too, resolve.py:208)
        sort_dims = psi_sort_dims if psi_sort_dims is not None \
            else psi_distance_dims
        if sort_dims is not None:
            sort_vals = [self.obs_psi[obs_index, self.psi_dim_names.index(d)]
                         for d in sort_dims][::-1]
            obs_index = obs_index[np.lexsort(sort_vals)]

        if len(obs_index) == 0:
            warnings.warn("No valid observations in resolution group")
            return
        if len(obs_index) == 1:
            self.obs_x_resolved[obs_index] = self.obs_x[obs_index]
            for k, v in (self.obs_special or {}).items():
                self.obs_special_resolved[k][obs_index] = v[obs_index]
            self.obs_resolve_status[obs_index] = True
            return

        fits = self.get_fits_batched(obs_index)
        obs_drt_list = [fits[i] for i in obs_index]
        obs_tau_indices = [self.obs_tau_indices[i] for i in obs_index]
        x_drt, x_special, tau_indices = resolve_mod.resolve_observations(
            obs_drt_list, obs_tau_indices, self.fit_kw.get("nonneg", True),
            truncate=truncate, sigma=sigma, lambda_psi=lambda_psi, unpack=True,
            tau_filter_sigma=tau_filter_sigma, special_filter_sigma=special_filter_sigma)

        self.obs_x_resolved[obs_index[:, None],
                            np.arange(tau_indices[0], tau_indices[1])[None, :]] = x_drt
        for key in x_special:
            if key not in self.obs_special_resolved:
                shape = (self.num_obs, *self.special_param_shape(key))
                self.obs_special_resolved[key] = np.zeros(shape)
            self.obs_special_resolved[key][obs_index] = x_special[key]
        self.obs_resolve_status[obs_index] = True

    def resolve_group(self, group_id, batch_size=7, overlap=2, psi_sort_dims=None,
                      psi_distance_dims=None, truncate=False, sigma=1, lambda_psi=1,
                      tau_filter_sigma=0, special_filter_sigma=0, batched=False,
                      mesh=None, coupled=False, dtype=None):
        """Overlapping-batch joint refinement of a group
        (reference drtmd.py:486-560).

        With batched=True all overlapping windows are assembled host-side and
        their block QPs solved as ONE vmapped (optionally mesh-sharded)
        computation (resolve.solve_resolve_batch) instead of the reference's
        serial per-window loop.

        With coupled=True the WHOLE psi-sorted group is solved as ONE
        box-constrained QP with cross-observation coupling — the exact
        optimum of the objective that the reference's overlapping
        batch_size=7 windows + overlap-averaging only approximate (a cvxopt
        size workaround, reference drtmd.py:513-545). Solved matrix-free by
        a Mehrotra interior-point method with PCG normal-equation solves
        (resolve.solve_coupled_group); batch_size and overlap are ignored."""
        obs_index = self.get_group_index(group_id)
        include = self.obs_fit_status[obs_index] & ~self.obs_ignore_flag[obs_index]
        obs_index = obs_index[include]

        if psi_sort_dims is not None or psi_distance_dims is not None:
            dims = psi_sort_dims or psi_distance_dims
            sort_vals = [self.obs_psi[obs_index, self.psi_dim_names.index(d)]
                         for d in dims][::-1]
            obs_index = obs_index[np.lexsort(sort_vals)]

        self.obs_x_resolved[obs_index] = 0
        num_obs = len(obs_index)
        if num_obs == 0:
            return

        if coupled and num_obs > 1:
            obs_drts = self.get_fits_batched(obs_index)
            drt_list = [obs_drts[i] for i in obs_index]
            ti_list = [self.obs_tau_indices[i] for i in obs_index]
            p_stack, q_stack, lb, my, cmat, meta = \
                resolve_mod.prepare_group_blocks(
                    drt_list, ti_list, self.fit_kw.get("nonneg", True),
                    truncate=truncate, sigma=sigma, lambda_psi=lambda_psi,
                    tau_filter_sigma=tau_filter_sigma,
                    special_filter_sigma=special_filter_sigma)
            special_dict, mti, nr, nc = meta
            x, rn_iter, kkt = resolve_mod.solve_coupled_group(
                p_stack, q_stack, lb, my, cmat, mesh=mesh, dtype=dtype)
            # Surface solver health: the matrix-free IP can stall on
            # pathological groups (max_iter/cg exhaustion). Calibrated on
            # representative systems: relative KKT ~1e-14 (f64) / ~1e-5
            # (f32), so these thresholds leave 2+ orders of headroom while
            # catching genuinely unconverged iterates.
            kkt_scale = max(1.0, float(np.abs(q_stack).max()))
            kkt_tol = (1e-3 if np.dtype(dtype or np.float64) == np.float32
                       else 1e-6) * kkt_scale
            self.resolve_info = {"coupled": True, "n_iter": rn_iter,
                                 "kkt_residual": kkt, "kkt_tol": kkt_tol}
            if not np.isfinite(kkt) or kkt > kkt_tol:
                warnings.warn(
                    f"Coupled group resolve did not fully converge "
                    f"(KKT residual {kkt:.3g} > {kkt_tol:.3g} after "
                    f"{rn_iter} IP iterations); the stored resolved "
                    f"distributions may be inaccurate. Consider dtype="
                    f"float64 or the windowed resolve (coupled=False).")
            x_drt, x_sp = resolve_mod.unpack_resolved_x(x, drt_list, special_dict)
            self.obs_x_resolved[obs_index[:, None],
                                np.arange(mti[0], mti[1])[None, :]] = x_drt
            for key, val in x_sp.items():
                if key not in self.obs_special_resolved:
                    shape = (self.num_obs, *self.special_param_shape(key))
                    self.obs_special_resolved[key] = np.zeros(shape)
                self.obs_special_resolved[key][obs_index] = val
            self.obs_resolve_status[obs_index] = True
            return

        batch_size = min(batch_size, num_obs)
        step = max(batch_size - overlap, 1)
        num_batches = 1 + int(np.ceil(max(num_obs - batch_size, 0) / step))

        windows = []
        for start in range(0, num_obs, step):
            if num_obs - start < batch_size:
                start = max(0, num_obs - batch_size)
            windows.append((start, start + batch_size))
            if start + batch_size >= num_obs:
                break

        x_batch = np.zeros((num_batches, num_obs, self.obs_x_resolved.shape[1]))
        x_special = {k: np.zeros((num_batches, num_obs, *self.special_param_shape(k)))
                     for k in (self.obs_special_resolved or {})}
        batch_margins = np.full((num_batches, num_obs), -1.0)

        use_batched = batched and num_obs > 1
        if use_batched:
            # Assemble every window's block QP, then solve all of them in one
            # vmapped, mesh-sharded matrix-free computation (each window
            # keeps its blockdiag(P_i) + psi-coupling structure; the dense
            # kron form OOM-killed the axon compile helper at production
            # window counts, see resolve.solve_resolve_batch)
            obs_drts = self.get_fits_batched(obs_index)
            systems, metas = [], []
            for (start, end) in windows:
                bidx = obs_index[start:end]
                drt_list = [obs_drts[i] for i in bidx]
                ti_list = [self.obs_tau_indices[i] for i in bidx]
                p_stack, q_stack, lb, my, cmat, meta = \
                    resolve_mod.prepare_group_blocks(
                        drt_list, ti_list, self.fit_kw.get("nonneg", True),
                        truncate=truncate, sigma=sigma, lambda_psi=lambda_psi,
                        tau_filter_sigma=tau_filter_sigma,
                        special_filter_sigma=special_filter_sigma)
                systems.append((p_stack, q_stack, lb, my, cmat))
                metas.append((meta, drt_list))
            try:
                xs = resolve_mod.solve_resolve_batch(systems, mesh=mesh,
                                                     dtype=dtype)
            except (TypeError, ValueError):
                # Caller bugs (bad dtype/mesh/shape) must surface, not
                # silently degrade to the ~100x-slower per-window path.
                raise
            except Exception as exc:
                # Insurance only (the matrix-free window program is ~30x
                # smaller than the dense form that used to OOM the axon
                # compile helper; tests/test_resolve_program_size.py bounds
                # it): per-window solves are semantically identical.
                warnings.warn(
                    f"vmapped window resolve failed to compile/run "
                    f"({type(exc).__name__}: {exc}); falling back to "
                    f"per-window solves")
                use_batched = False
        if use_batched:
            for i, (x_win, ((special_dict, mti, nr, nc), drt_list)) \
                    in enumerate(zip(xs, metas)):
                start, end = windows[i]
                bidx = obs_index[start:end]
                x_drt, x_sp = resolve_mod.unpack_resolved_x(
                    np.asarray(x_win), drt_list, special_dict)
                self.obs_x_resolved[bidx[:, None],
                                    np.arange(mti[0], mti[1])[None, :]] = x_drt
                for key, val in x_sp.items():
                    if key not in self.obs_special_resolved:
                        shape = (self.num_obs, *self.special_param_shape(key))
                        self.obs_special_resolved[key] = np.zeros(shape)
                        x_special[key] = np.zeros(
                            (num_batches, num_obs, *self.special_param_shape(key)))
                    self.obs_special_resolved[key][bidx] = val
                x_batch[i, start:end] = self.obs_x_resolved[bidx]
                for key in x_special:
                    x_special[key][i, start:end] = \
                        self.obs_special_resolved[key][bidx]
                batch_margins[i, start:end] = np.minimum(
                    np.arange(batch_size), np.arange(batch_size)[::-1])
        else:
            for i, (start, end) in enumerate(windows):
                batch_index = obs_index[start:end]
                self.resolve_observations(batch_index, None, psi_distance_dims,
                                          truncate, sigma, lambda_psi,
                                          tau_filter_sigma, special_filter_sigma)
                x_batch[i, start:end] = self.obs_x_resolved[batch_index]
                for key in x_special:
                    x_special[key][i, start:end] = \
                        self.obs_special_resolved[key][batch_index]
                batch_margins[i, start:end] = np.minimum(
                    np.arange(batch_size), np.arange(batch_size)[::-1])

        if overlap > 0 and num_obs > 1:
            batch_weights = batch_margins + 0.1
            batch_weights[batch_weights < 0] = 0
            x_weights = np.moveaxis(np.tile(batch_weights, (x_batch.shape[-1], 1, 1)), 0, -1)
            self.obs_x_resolved[obs_index] = np.average(x_batch, axis=0, weights=x_weights)
            for key, val in x_special.items():
                if val.ndim > 2:
                    kw_weights = np.moveaxis(np.tile(batch_weights, (val.shape[-1], 1, 1)), 0, -1)
                else:
                    kw_weights = batch_weights
                self.obs_special_resolved[key][obs_index] = np.average(
                    val, axis=0, weights=kw_weights)
        self.obs_resolve_status[obs_index] = True

    # ------------------------------------------------------------------
    # Prediction (reference drtmd.py:788-1135)
    # ------------------------------------------------------------------
    def predict_x(self, psi=None, obs_index=None, resolved=True, factor_index=None):
        """DRT coefficients (on the supergrid) at requested psi/indices; nearest
        neighbor in psi if interpolation is not required. For fit_type='pfrt',
        factor_index selects one regularization level (reference
        drtmd.py:820-821); otherwise all levels are returned."""
        x_source = self.obs_x_resolved if (resolved and self.fit_type == "drt"
                                           and self.obs_resolve_status.any()) \
            else self.obs_x
        if obs_index is not None:
            x = x_source[np.asarray(obs_index)]
        elif psi is None:
            x = x_source
        else:
            psi = np.atleast_2d(psi)
            idx = [int(np.argmin(np.sum((self.obs_psi - p) ** 2, axis=1))) for p in psi]
            x = x_source[idx]
        if self.fit_type == "pfrt" and factor_index is not None:
            x = x[:, factor_index, :]
        return x

    def predict_drt(self, psi=None, obs_index=None, tau=None, order=0, resolved=True):
        """gamma(ln tau) for requested observations."""
        from ..ops import basis as basis_mod
        if tau is None:
            tau = self.tau_supergrid
        x = self.predict_x(psi, obs_index, resolved)
        em = basis_mod.func_eval_matrix_host(
            np.log(self.tau_supergrid), np.log(np.asarray(tau)),
            self.tau_basis_type, self.tau_epsilon, order)
        return x @ em.T

    def predict_r_p(self, psi=None, obs_index=None, resolved=True):
        from ..ops import basis as basis_mod
        area = basis_mod.get_basis_func_area(self.tau_basis_type, self.tau_epsilon)
        x = self.predict_x(psi, obs_index, resolved)
        return np.sum(np.abs(x), axis=-1) * area

    def predict_special(self, key, psi=None, obs_index=None, resolved=True):
        source = self.obs_special_resolved if (resolved and self.obs_resolve_status.any()) \
            else self.obs_special
        vals = source[key]
        if obs_index is not None:
            return vals[np.asarray(obs_index)]
        if psi is None:
            return vals
        psi = np.atleast_2d(psi)
        idx = [int(np.argmin(np.sum((self.obs_psi - p) ** 2, axis=1))) for p in psi]
        return vals[idx]

    def predict_param_cov(self, obs_index, factor_index=None):
        """Laplace parameter covariance per observation (reference
        drtmd.py:925-955). For pfrt fits, factor_index selects one
        regularization level; None returns covariances for all levels."""
        cov_matrices = []
        for index in np.atleast_1d(obs_index):
            if self.obs_fit_status[index]:
                drt = self.get_fit(index)
                if self.fit_type == "pfrt":
                    step_p = drt.pfrt_result["step_p_mat"]
                    if factor_index is not None:
                        cov = drt.estimate_param_cov(p_matrix=step_p[factor_index])
                    else:
                        cov = np.array([drt.estimate_param_cov(p_matrix=pm)
                                        for pm in step_p])
                else:
                    cov = drt.estimate_param_cov()
            else:
                cov = None
            cov_matrices.append(cov)
        return cov_matrices

    def predict_x_cov(self, obs_index, factor_index=None):
        """DRT-coefficient covariance on the supergrid (reference
        drtmd.py:957-975)."""
        obs_index = np.atleast_1d(obs_index)
        cov = self.predict_param_cov(obs_index, factor_index)
        if self.fit_type == "pfrt" and factor_index is None:
            shape = (len(cov), len(self.pfrt_factors),
                     len(self.tau_supergrid), len(self.tau_supergrid))
        else:
            shape = (len(cov), len(self.tau_supergrid), len(self.tau_supergrid))
        x_cov = np.zeros(shape)
        for i, index in enumerate(obs_index):
            if cov[i] is None:
                x_cov[i] = np.nan
                continue
            li, ri = self.obs_tau_indices[index]
            drt = self.get_fit(index)
            ns = drt.get_qp_mat_offset()
            if self.fit_type == "pfrt" and factor_index is None:
                x_cov[i, :, li:ri, li:ri] = cov[i][:, ns:, ns:]
            else:
                x_cov[i, li:ri, li:ri] = cov[i][ns:, ns:]
        return x_cov

    # ------------------------------------------------------------------
    # Convenience accessors (reference drtmd.py:561-1135)
    # ------------------------------------------------------------------
    def get_tau_eval(self, ppd=10):
        """Evaluation grid over the tau supergrid (reference drtmd.py)."""
        log_min = np.log10(self.tau_supergrid[0])
        log_max = np.log10(self.tau_supergrid[-1])
        return np.logspace(log_min, log_max, int((log_max - log_min) * ppd) + 1)

    def get_nu_eval(self, n=201):
        return np.linspace(-1, 1, n)

    @property
    def tau_basis_area(self):
        from ..ops import basis as basis_mod
        return basis_mod.get_basis_func_area(self.tau_basis_type, self.tau_epsilon)

    def get_psi_index(self, psi):
        """Indices of the nearest stored observations to the given psi rows."""
        psi = np.atleast_2d(psi)
        return np.array([int(np.argmin(np.sum((self.obs_psi - p) ** 2, axis=1)))
                         for p in psi])

    def unique_group_ids(self):
        seen = []
        for g in self.obs_group_id:
            if g not in seen:
                seen.append(g)
        return seen

    def fitted_obs_index(self):
        return np.where(self.obs_fit_status & ~self.obs_ignore_flag)[0]

    @property
    def obs_dtype(self):
        """Per-observation data type: 'eis', 'chrono', or 'hybrid'
        (reference drtmd.py obs_dtype)."""
        out = []
        for i in range(self.num_obs):
            chrono_data, eis_data = self.get_obs_data(i)
            has_c = chrono_data is not None and chrono_data[0] is not None
            has_e = eis_data is not None and eis_data[0] is not None
            out.append("hybrid" if (has_c and has_e)
                       else ("eis" if has_e else "chrono"))
        return out

    def filter_psi(self, dim_eq=None, dim_gt=None, dim_lt=None,
                   return_index=True, exclude_flagged=False):
        """Select observations by psi-coordinate conditions (reference
        drtmd.py filter_psi): dim_eq/gt/lt map dimension name -> value."""
        conditions = [np.ones(self.num_obs, dtype=bool)]
        for cond_dict, op in ((dim_eq, np.equal), (dim_gt, np.greater),
                              (dim_lt, np.less)):
            for name, val in (cond_dict or {}).items():
                col = self.obs_psi[:, self.psi_dim_names.index(name)]
                conditions.append(op(col, val))
        if exclude_flagged:
            conditions.append(~self.obs_ignore_flag)
        mask = np.logical_and.reduce(conditions)
        return np.where(mask)[0] if return_index else mask

    def obs_psi_df(self):
        import pandas as pd
        names = self.psi_dim_names or [f"psi{i}" for i in range(self.obs_psi.shape[1])]
        df = pd.DataFrame(self.obs_psi, columns=names)
        df["group_id"] = self.obs_group_id
        df["fitted"] = self.obs_fit_status
        df["ignore"] = self.obs_ignore_flag
        return df

    def clear_fits(self):
        """Reset all fit results, keeping the observations."""
        self.obs_fit_status[:] = False
        self.obs_resolve_status[:] = False
        self.obs_x[:] = 0
        self.obs_drt_var[:] = 0
        self.obs_x_resolved[:] = 0
        self.obs_x_filt[:] = 0
        self.obs_fit_attr = [None] * self.num_obs
        self.obs_tau_indices = [None] * self.num_obs
        for d in (self.obs_special, self.obs_special_resolved, self.obs_special_filt):
            if d is not None:
                for k in d:
                    d[k][:] = 0

    def clear_obs(self):
        """Remove all observations and results, keeping the configuration."""
        self.__init__(tau_supergrid=self.tau_supergrid, psi_dim_names=self.psi_dim_names,
                      tau_basis_type=self.tau_basis_type, tau_epsilon=self.tau_epsilon,
                      step_model=self.step_model, chrono_mode=self.chrono_mode,
                      fit_inductance=self.fit_inductance, fit_ohmic=self.fit_ohmic,
                      fit_capacitance=self.fit_capacitance,
                      fixed_basis_nu=self.fixed_basis_nu, fit_dop=self.fit_dop,
                      normalize_dop=self.normalize_dop,
                      nu_basis_type=self.nu_basis_type, nu_epsilon=self.nu_epsilon,
                      chrono_reader=self.chrono_reader, eis_reader=self.eis_reader,
                      fit_kw=self.fit_kw, fit_type=self.fit_type,
                      pfrt_factors=self.pfrt_factors, warn=self.warn,
                      print_progress=self.print_progress)

    def load_observations(self, psi_array, chrono_files=None, eis_files=None,
                          group_ids=None, fit=False):
        """Register observations given per-observation data files
        (reference drtmd.py load path; reading is lazy via the readers)."""
        n = len(psi_array)
        chrono_files = chrono_files or [None] * n
        eis_files = eis_files or [None] * n
        group_ids = group_ids if group_ids is not None else [None] * n
        for psi, cf, ef, gid in zip(psi_array, chrono_files, eis_files, group_ids):
            self.add_observation(psi, cf, ef, group_id=gid, fit=fit)

    # ------------------------------------------------------------------
    # Filtered predictions and QC scoring (reference drtmd.py:561-780)
    # ------------------------------------------------------------------
    def filter_observations(self, obs_index=None, psi_sort_dims=None, resolved=True,
                            sigma=(1, 1), store=True, **filter_kw):
        """ndx-filter the (psi-sorted) DRT map; assumes a 2-D (psi, tau) map
        (reference drtmd.py:561; for higher dims use ndx.assemble_ndx)."""
        from scipy import ndimage
        if obs_index is None:
            obs_index = np.arange(self.num_obs)
        obs_index = np.asarray(obs_index)
        include = self.obs_fit_status[obs_index] & ~self.obs_ignore_flag[obs_index]
        obs_index = obs_index[include]
        if psi_sort_dims is not None:
            sort_vals = [self.obs_psi[obs_index, self.psi_dim_names.index(d)]
                         for d in psi_sort_dims][::-1]
            obs_index = obs_index[np.lexsort(sort_vals)]
        x_src = self.obs_x_resolved if (resolved and self.obs_resolve_status.any())             else self.obs_x
        x = ndimage.gaussian_filter(np.asarray(x_src[obs_index], dtype=float),
                                    sigma=sigma, **filter_kw)
        if store:
            self.obs_x_filt[obs_index] = x
        sp_src = self.obs_special_resolved if (resolved and self.obs_resolve_status.any())             else self.obs_special
        sp_out = {}
        for key, vals in (sp_src or {}).items():
            v = np.asarray(vals[obs_index], dtype=float)
            sig = sigma[0] if np.ndim(sigma) else sigma
            v_f = ndimage.gaussian_filter1d(v, sigma=sig, axis=0) if v.ndim > 0 else v
            sp_out[key] = v_f
            if store:
                self.obs_special_filt[key][obs_index] = v_f
        return obs_index, x, sp_out

    def filter_group(self, group_id, **kw):
        return self.filter_observations(self.get_group_index(group_id), **kw)

    def score_group_fit_badness(self, group_id, psi_sort_dims=None,
                                median_size=(3, 3), std_size=(5, 3)):
        """Per-observation fit-badness score: RSS of the fitted map vs its
        median-filtered version (reference drtmd.py:737)."""
        from scipy import ndimage
        from .nddata import flag_bad_obs
        obs_index = self.get_group_index(group_id)
        if psi_sort_dims is not None:
            sort_vals = [self.obs_psi[obs_index, self.psi_dim_names.index(d)]
                         for d in psi_sort_dims][::-1]
            obs_index = obs_index[np.lexsort(sort_vals)]
        x_array = np.asarray(self.obs_x[obs_index], dtype=float).copy()
        ignore = self.obs_ignore_flag[obs_index] | ~self.obs_fit_status[obs_index]
        x_array[ignore] = np.nan
        x_filt = ndimage.median_filter(np.nan_to_num(x_array), size=median_size)
        _, rss_list = flag_bad_obs(x_array, x_filt, std_size=std_size, return_rss=True)
        x_rss = np.asarray(rss_list[0]).reshape(-1)
        self.obs_fit_badness[obs_index] = x_rss
        return obs_index, x_rss

    def score_group_data_badness(self, group_id, **kk_kw):
        """Per-observation data-badness: fraction of Kramers-Kronig outlier
        points in each EIS spectrum (reference drtmd.py:700-735)."""
        obs_index = self.get_group_index(group_id)
        scores = np.zeros(len(obs_index))
        for i, idx in enumerate(obs_index):
            chrono_data, eis_data = self.get_obs_data(idx)
            if eis_data[0] is None:
                continue
            try:
                drt = DRT(warn=False)
                out_idx = drt.kk_test(np.asarray(eis_data[0]),
                                      np.asarray(eis_data[1]), **kk_kw)
                scores[i] = np.mean(out_idx) if out_idx is not None else 0.0
            except Exception:
                scores[i] = np.nan
        self.obs_data_badness[obs_index] = scores
        return obs_index, scores

    # ------------------------------------------------------------------
    # Uncertainty / probability maps (reference drtmd.py:1012-1135)
    # ------------------------------------------------------------------
    def predict_drt_cov(self, obs_index, tau=None, order=0, factor_index=None,
                        extend_var=True):
        """Distribution covariance per observation on an eval grid."""
        if tau is None:
            tau = self.get_tau_eval(10)
        covs = []
        for idx in np.atleast_1d(obs_index):
            if not self.obs_fit_status[idx]:
                covs.append(np.full((len(tau), len(tau)), np.nan))
                continue
            drt = self.get_fit(idx)
            if self.fit_type == "pfrt" and factor_index is not None:
                pm = drt.pfrt_result["step_p_mat"][factor_index]
                cov = drt.estimate_distribution_cov(tau=tau, order=order,
                                                    p_matrix=pm, extend_var=extend_var)
            else:
                cov = drt.estimate_distribution_cov(tau=tau, order=order,
                                                    extend_var=extend_var)
            covs.append(cov if cov is not None
                        else np.full((len(tau), len(tau)), np.nan))
        return covs

    def predict_drt_var(self, obs_index, tau=None, order=0, factor_index=None,
                        extend_var=True):
        covs = self.predict_drt_cov(obs_index, tau, order, factor_index, extend_var)
        return np.array([np.diag(c) for c in covs])

    def predict_x_var(self, obs_index, factor_index=None):
        x_cov = self.predict_x_cov(obs_index, factor_index)
        return np.array([np.diag(c) if c.ndim == 2 else
                         np.stack([np.diag(ck) for ck in c]) for c in x_cov])

    def predict_dop(self, psi=None, obs_index=None, nu=None, normalize=True,
                    resolved=True):
        """DOP over nu for requested observations (reference drtmd.py:853)."""
        if not self.fit_dop:
            raise ValueError("DOP was not fitted")
        from ..ops import basis as basis_mod
        from ..ops import phasance
        if nu is None:
            nu = self.get_nu_eval()
        x_dop = self.predict_special("x_dop", psi=psi, obs_index=obs_index,
                                     resolved=resolved)
        basis_nu = self.fixed_basis_nu if self.fixed_basis_nu is not None             else np.concatenate([np.linspace(-1, -0.4, 25), np.linspace(0.4, 1, 25)])
        # nu_epsilon defaults to None in the config; the fitted drt1d resolves
        # it, so fall back to that (or the grid-spacing default) here
        nu_epsilon = self.nu_epsilon
        if nu_epsilon is None:
            nu_epsilon = getattr(self.drt1d, "nu_epsilon", None)
        if nu_epsilon is None:
            nu_epsilon = 1 / np.abs(np.median(np.diff(np.sort(basis_nu))))
        em = basis_mod.func_eval_matrix_host(
            np.asarray(basis_nu), np.asarray(nu), self.nu_basis_type,
            nu_epsilon, 0)
        dop = x_dop @ em.T
        if normalize:
            sv = np.asarray(phasance.phasor_scale_vector(np.asarray(nu),
                                                         self.tau_supergrid))
            dop = dop / sv
        return dop

    def predict_curv_prob(self, psi=None, obs_index=None, tau=None,
                          factor_index=None, extend_var=True):
        """P(negative curvature & positive height) map over (obs, tau)
        (reference drtmd.py:1066)."""
        from scipy.special import ndtr
        if tau is None:
            tau = self.get_tau_eval(10)
        if obs_index is None:
            obs_index = self.get_psi_index(psi) if psi is not None                 else self.fitted_obs_index()
        f = self.predict_drt(obs_index=obs_index, tau=tau, order=0)
        fxx = self.predict_drt(obs_index=obs_index, tau=tau, order=2)
        if self.fit_type == "pfrt":
            fi = factor_index if factor_index is not None else 0
            f = f[:, fi] if f.ndim == 3 else f
            fxx = fxx[:, fi] if fxx.ndim == 3 else fxx
        f_var = self.predict_drt_var(obs_index, tau=tau, order=0,
                                     factor_index=factor_index, extend_var=extend_var)
        fxx_var = self.predict_drt_var(obs_index, tau=tau, order=2,
                                       factor_index=factor_index, extend_var=extend_var)
        p_curv = 1 - ndtr(fxx / np.sqrt(np.maximum(fxx_var, 1e-30)))
        p_f = 1 - ndtr(-f / np.sqrt(np.maximum(f_var, 1e-30)))
        return p_curv * p_f

    def predict_peak_prob(self, psi=None, obs_index=None, tau=None,
                          factor_index=None, extend_var=True):
        """Peak-probability map via the surface peak/trough model
        (reference drtmd.py:1023)."""
        from .surface import peak_prob, trough_prob
        if tau is None:
            tau = self.get_tau_eval(10)
        if obs_index is None:
            obs_index = self.get_psi_index(psi) if psi is not None                 else self.fitted_obs_index()
        f = self.predict_drt(obs_index=obs_index, tau=tau, order=0)
        fx = self.predict_drt(obs_index=obs_index, tau=tau, order=1)
        fxx = self.predict_drt(obs_index=obs_index, tau=tau, order=2)
        f_var = self.predict_drt_var(obs_index, tau=tau, order=0,
                                     factor_index=factor_index, extend_var=extend_var)
        fx_var = self.predict_drt_var(obs_index, tau=tau, order=1,
                                      factor_index=factor_index, extend_var=extend_var)
        fxx_var = self.predict_drt_var(obs_index, tau=tau, order=2,
                                       factor_index=factor_index, extend_var=extend_var)
        pp_ = peak_prob(f, fx, fxx, f_var=f_var, fx_var=fx_var, fxx_var=fxx_var)
        tp_ = trough_prob(f, fx, fxx, f_var=f_var, fx_var=fx_var, fxx_var=fxx_var)
        return pp_ * (1 - tp_)

    # ------------------------------------------------------------------
    # Persistence (reference drtmd.py:1382-1477)
    # ------------------------------------------------------------------
    _persist_attrs = [
        "fit_type", "pfrt_factors",
        "tau_supergrid", "psi_dim_names", "tau_basis_type", "tau_epsilon",
        "fixed_basis_nu", "nu_basis_type", "nu_epsilon", "fit_dop", "fit_kw",
        "batch_fit_kw",
        "fit_ohmic", "fit_inductance", "fit_capacitance", "normalize_dop",
        "step_model", "chrono_mode",
        "obs_psi", "obs_data", "obs_group_id", "obs_data_badness", "obs_ignore_flag",
        "obs_x", "obs_drt_var", "obs_special", "obs_fit_status", "obs_fit_badness",
        "obs_tau_indices", "obs_llh", "obs_rss", "obs_resolve_status",
        "obs_x_resolved", "obs_special_resolved", "obs_x_filt", "obs_special_filt",
        "obs_fit_attr",
    ]

    @property
    def attribute_categories(self):
        """Persistable attributes grouped by category (reference
        drtmd.py:1348). Category names match the reference so
        ``get_attributes('config')`` etc. behave identically."""
        fit_keys = {"obs_fit_status", "obs_fit_attr", "obs_fit_badness",
                    "obs_tau_indices", "obs_x", "obs_special", "obs_drt_var",
                    "obs_resolve_status", "obs_x_resolved",
                    "obs_special_resolved", "obs_x_filt", "obs_special_filt",
                    "obs_llh", "obs_rss"}
        obs_keys = {"obs_psi", "obs_data", "obs_group_id", "obs_ignore_flag",
                    "obs_data_badness"}
        return {
            "config": [k for k in self._persist_attrs
                       if k not in fit_keys and k not in obs_keys],
            "obs_data": [k for k in self._persist_attrs if k in obs_keys],
            "fit": [k for k in self._persist_attrs if k in fit_keys],
        }

    def _category_attr_names(self, which):
        if which is None or which == "all":
            return list(self._persist_attrs)
        if isinstance(which, str):
            which = [which]
        cats = self.attribute_categories
        try:
            return sum([cats[c] for c in which], [])
        except KeyError:
            raise ValueError(
                "Invalid attribute category; valid: "
                f"{['all'] + list(cats.keys())}")

    def get_attributes(self, which=None):
        """Attribute dict, optionally restricted to a category or list of
        categories ('config' | 'obs_data' | 'fit' | 'all'; reference
        drtmd.py:1382)."""
        return {k: getattr(self, k) for k in self._category_attr_names(which)}

    def set_attributes(self, att_dict):
        for k, v in att_dict.items():
            setattr(self, k, v)

    def save_attributes(self, which, dest=None):
        """Pickle attributes to ``dest``. Reference signature is
        ``save_attributes(which, dest)`` (drtmd.py:1418); calling with a
        single path argument saves everything."""
        if dest is None:
            which, dest = None, which
        with open(dest, "wb") as f:
            pickle.dump(self.get_attributes(which), f)

    def load_attributes(self, source):
        """Set attributes from a pickle written by save_attributes; overwrites
        observations/fits present in the file (reference drtmd.py)."""
        with open(source, "rb") as f:
            self.set_attributes(pickle.load(f))

    @classmethod
    def from_source(cls, source):
        if not isinstance(source, dict):
            with open(source, "rb") as f:
                att_dict = pickle.load(f)
        else:
            att_dict = dict(source)
        config_keys = ["tau_supergrid", "psi_dim_names", "tau_basis_type",
                       "tau_epsilon", "fixed_basis_nu", "nu_epsilon", "nu_basis_type",
                       "fit_dop", "fit_ohmic", "fit_inductance",
                       "fit_capacitance", "normalize_dop", "step_model",
                       "chrono_mode"]
        init_kw = {k: att_dict.pop(k) for k in config_keys if k in att_dict}
        drtmd = cls(**init_kw)
        drtmd.set_attributes(att_dict)
        return drtmd
