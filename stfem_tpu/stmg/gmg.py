"""Space-time multigrid preconditioner (the reference's GMG, stmg.h:1047-1419)
rebuilt TPU-native.

One GMG object owns the whole hierarchy: per-level slab operators (in reduced
precision), cell-Vanka patch inverses, Relaxation/Chebyshev/Identity smoother
wiring with deterministic power-iteration eigenvalue estimates, separable
space transfers and dense time transfers.  vmult() is ONE V-cycle with
deal.II Multigrid semantics:

  pre-smooth:  apply() -- u = S(d), then (steps2-1) x (u += S(d - A u))
  post-smooth: smooth() -- steps2 x (u += S(d - A u))
  steps2 = smoothing_steps * 2^(max_level - level) when `variable`
  coarse:     apply() of the coarsest smoother (default), or fixed-iteration
              left-preconditioned GMRES (coarse_grid_smoother_type != Smoother)

The whole V-cycle is pure traceable JAX: it compiles into the FGMRES solve.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

from ..krylov import gmres_fixed_left
from ..mesh.grid import StructuredMesh
from ..ops.spatial import LaplaceMassOperator
from ..system import SystemMatrix
from ..time.mg_seq import (get_mg_sequence, get_poly_mg_sequence,
                           get_precondition_stmg_types)
from ..time.tables import (get_fe_time_weights_sequence,
                           get_fe_time_weights_wave,
                           get_fe_time_weights_wave_sequence)
from ..types import (CoarseningType, MGType, PolynomialCoarseningSequenceType,
                     ProblemType, SupportedSmoothers, TimeStepType)
from ..utils.module import register_module
from .smoother import (ChebyshevSmoother, IdentitySmoother, RelaxationSmoother,
                       chebyshev_parameters, estimate_eigenvalues,
                       relaxation_parameters)
from .transfers import (SpaceTransfer, TimeTransfer, h_prolongation_global_1d,
                        p_prolongation_global_1d)
from .vanka import PreconditionVanka


@dataclass
class GMGParams:
    """Mirror of PreconditionerGMGAdditionalData (reference parameters.h:12-31)."""
    smoothing_range: float = 1.0
    # parsed for config compatibility; DEAD in the reference's compiled
    # code too -- its GMG uses smoothing_steps for both the Relaxation
    # n_iterations and the Chebyshev degree (stmg.h:1212,1224); the only
    # consumer is the stale, non-compiling transfer_01.cc:283
    smoothing_degree: int = 5
    smoothing_eig_cg_n_iterations: int = 20
    smoothing_steps: int = 1
    relaxation: float = 0.0             # 0.0 => estimate
    coarse_grid_smoother_type: str = "Smoother"
    smoother: SupportedSmoothers = SupportedSmoothers.Relaxation
    coarse_grid_maxiter: int = 10
    coarse_grid_abstol: float = 1e-20
    coarse_grid_reltol: float = 1e-4
    # Direct coarse via the exact pseudo-inverse: REQUIRED for singular
    # saddle-point coarse systems (enclosed-flow Stokes pressure
    # nullspace) -- a fixed-iteration Krylov coarse solve amplifies the
    # near-null directions and makes the 3D V-cycle non-contractive
    # (measured, scripts/stokes_spectrum_lab.py)
    coarse_direct_pinv: bool = False
    restrict_is_transpose_prolongate: bool = True
    variable: bool = True
    # deal.II safety factor on the power-iteration max-eigenvalue estimate.
    # NOTE: iteration counts match the reference's goldens only to +-1-2
    # because the estimate depends on dof ORDER through the deterministic
    # start vector (lexicographic here vs deal.II's hierarchical numbering).
    # POWER MODE ONLY -- the default arnoldi mode (below) replaces both the
    # estimate and the safety factor.
    eig_safety_factor: float = 1.2
    # order-invariant eigenvalue estimation (round-3 parity fix): use a
    # CONVERGED Arnoldi lambda_max instead of the 20-step power iteration
    # wherever feasible (host-side estimates up to eig_exact_max_n total
    # unknowns, incl. proxy-mesh estimates).  Measured to restore the
    # reference's golden iteration counts to +-1 (tf01 refs 2-3: 7/8 vs
    # goldens 7/9, was 9/9 -- scripts/eig_parity_lab.py); the power
    # estimate depends on dof ORDER through its start vector (VERDICT r2
    # #4).  False = deal.II-faithful 20-step power + 1.2 safety.
    eig_exact: bool = True
    eig_exact_max_n: int = 4_000_000
    # store Vanka patch factors in bfloat16 (zero measured iteration cost,
    # half the smoother memory/bandwidth on TPU)
    vanka_bf16: bool = False
    # cap on the `variable` doubling (2^(max-l) smoothing steps): bounds the
    # sequential coarse-level work on TPU while keeping h-robustness;
    # 0 = uncapped (deal.II behavior)
    variable_steps_cap: int = 0
    # True: Identity levels contribute nothing (u=0 pre-smooth, no post) --
    # helps strongly-coupled systems (wave); False: deal.II-faithful
    # MGSmootherPrecondition-with-PreconditionIdentity Richardson steps.
    skip_identity_levels: bool = False
    # inner Relaxation/Chebyshev iterations per smoother application
    # (reference smoothing DEGREE); None = same as smoothing_steps (the
    # historical wiring, which applies steps twice: degree x MG steps)
    smoother_inner_iterations: int | None = None
    # asymmetric cycle: inner relaxation sweeps for the POST-smoother only
    # (None = same as smoother_inner_iterations).  A perf knob, not a
    # reference behavior: post_inner=1 drops one (vanka + level matvec)
    # per level visit; worthwhile when the iteration count holds
    post_smoother_inner_iterations: int | None = None
    # V(k,0) cycle: skip post-smoothing entirely.  NOT a reference behavior
    # (deal.II Multigrid always post-smooths); a throughput knob for the
    # outer-Krylov-wrapped use where the fine-level post-smooth is ~half the
    # V-cycle cost and the Krylov method absorbs the weaker cycle.
    no_post_smooth: bool = False
    # V(k,0) on the FINEST level only: the finest post-smooth is the single
    # most expensive smoother application in the cycle (its level holds
    # ~7/8 of all dofs), while coarse-level post-smoothing is nearly free
    # and keeps the cycle quality; a middle ground between the full cycle
    # and no_post_smooth
    no_post_smooth_finest: bool = False
    # Run the WHOLE V-cycle in bfloat16 (level operators, Vanka down/up
    # matmuls, transfers): halves the HBM traffic of the grid-sumfac
    # temporaries, which bound the fine-level cost.  The Vanka time-solve
    # factors and the coarse direct inverse stay f32 (bf16 per-step
    # recurrences lose the scan); the outer Krylov stays in the caller's
    # dtype (flexible GMRES tolerates the inexact preconditioner).
    # Heat/wave hierarchy only (build_stmg); requires grid-mode Vanka.
    level_bf16: bool = False
    # >0: estimate the smoother eigenvalues on a PROXY mesh of this many
    # cells per axis with the SAME cell size h, element degree, and time
    # tables.  lambda_max(P A) of the Vanka-smoothed operator is
    # h-independent (the method's own h-robustness), so a tiny local
    # problem reproduces it; the faithful per-level power iteration is
    # O(level dofs) per sweep and dominates setup at 16^3+ (measured
    # 386 s of a ~400 s CPU setup).  0 = faithful (reference semantics);
    # applies only to uniform unmapped coefficient-free levels larger
    # than the proxy.
    eig_proxy_cells: int = 0
    # Give EVERY level a real smoother instead of the reference's
    # Identity-on-paired-levels scheme.  NOT needed for h-robustness: the
    # round-2 root cause of the h-growth was the LADDER ORDERING
    # (space_time_level_first) -- with tau levels deep in the ladder
    # (zip_from_back=false, the golden-era default) the faithful
    # Identity-pairing scheme is h-flat (9/9/8/7.94 over tf01 refs 2-5 vs
    # goldens 7/9/8.75/7.875); with tau near the fine end NOTHING fixes the
    # growth (all-smoothed: 9/9/9.5/12; measured, scripts/h_growth_lab.py
    # + tau_twogrid_lab.py: the stuck modes are spatially-smooth x
    # inter-step-jump, undamped by any omega and unrepresentable after
    # tau-coarsening).  Kept as an experiment knob.
    smooth_all_levels: bool = False


@register_module
@dataclass
class _Level:
    matrix: SystemMatrix
    smoother: object
    n_blocks: int
    dof_shape: tuple


@register_module
class GMG:
    # coarse systems up to this many unknowns may be assembled + inverted
    DIRECT_COARSE_MAX = 16384

    def __init__(self, levels, transfers, params: GMGParams, dtype,
                 precondition_sequence):
        self.levels = levels
        self.transfers = transfers
        self.params = params
        self.dtype = dtype
        self.precondition_sequence = precondition_sequence
        self.max_level = len(levels) - 1
        # optional per-level NamedShardings (parallel.sharding.
        # level_sharding_policy): explicit distribution of the WHOLE V-cycle
        # over a device mesh, incl. the coarse-level replication rule -- the
        # analogue of the reference's per-level partitioners/repartitioning
        # (stmg.h:563-586).  None = let GSPMD propagate from the fine level.
        self.level_shardings = None
        # normalized nullspace vector(s) of the coarse operator (enclosed-
        # flow Stokes: per-time-block constant pressure).  The coarse
        # defect/solution are projected onto range(A_c): a fixed-iteration
        # Krylov coarse solve otherwise amplifies the near-null directions
        # the patch-regularized Vanka creates (measured: 2D tf01stokes
        # 60 iters unprojected vs golden 12; 3D rho(I-PA) 1.32 --
        # scripts/stokes_spectrum_lab.py, stokes3d_lab.py)
        self.coarse_null = None
        self.coarse_Ainv = None
        if params.coarse_grid_smoother_type == "Direct":
            self.coarse_Ainv = self._assemble_direct_coarse()

    def _assemble_direct_coarse(self):
        """Dense inverse of the coarsest slab operator (TPU-natural coarse
        solver: the coarsest space-time system is a few hundred unknowns, so
        ONE assembled inverse replaces the reference's coarse GMRES chain --
        exact coarse correction at one matmul of runtime cost)."""
        import jax

        lvl = self.levels[0]
        n = lvl.n_blocks * int(np.prod(lvl.dof_shape))
        assert n <= self.DIRECT_COARSE_MAX, \
            f"coarse level too large for Direct solver ({n})"
        shape = (lvl.n_blocks,) + tuple(lvl.dof_shape)
        eye = jnp.eye(n, dtype=self.dtype).reshape((n,) + shape)
        cols = jax.jit(jax.vmap(lvl.matrix.vmult))(eye).reshape(n, n)
        # the inverse is computed and stored in f32 even for bf16 levels
        # (bf16 LU of the assembled coarse system is not reliable)
        A = cols.T.astype(jnp.float32)
        # unit diagonal on constrained (masked-away) dofs
        zero_rows = (jnp.max(jnp.abs(A), axis=1) == 0.0).astype(jnp.float32)
        A = A + jnp.diag(zero_rows)
        if self.params.coarse_direct_pinv:
            # saddle-point systems with an enclosed-flow pressure nullspace
            # (constant-per-timeblock modes) are SINGULAR: the exact
            # pseudo-inverse solves on range(A) and drops the null
            # directions, where a Krylov coarse solve amplifies them --
            # measured root cause of the non-contractive 3D Stokes V-cycle
            # (rho(I-PA) 1.198 with GMRES(10) coarse vs 1.0-with-clean-
            # spectrum with the exact solve; scripts/stokes_spectrum_lab.py)
            # host numpy pinv: ALWAYS true f64 regardless of
            # jax_enable_x64 (ADVICE r4: jnp astype(f64) is a silent no-op
            # with x64 off, and f32 SVD noise ~1e-7*smax sits above the
            # 1e-10 rcond, so the near-null directions would NOT be
            # truncated -- defeating the fix this pinv exists for)
            A64 = np.asarray(jax.device_get(A), np.float64)
            return jnp.asarray(np.linalg.pinv(A64, rcond=1e-10),
                               jnp.float32)
        return jnp.linalg.inv(A)

    def _steps2(self, level: int) -> int:
        s = self.params.smoothing_steps
        if self.params.variable:
            m = 2 ** (self.max_level - level)
            if self.params.variable_steps_cap:
                m = min(m, self.params.variable_steps_cap)
            s *= m
        return s

    def _apply_smoother(self, level: int, rhs):
        """MGSmootherPrecondition::apply (zero initial guess)."""
        lvl = self.levels[level]
        if self.params.skip_identity_levels and \
                isinstance(lvl.smoother, IdentitySmoother):
            return jnp.zeros_like(rhs)
        u = lvl.smoother.vmult(rhs)
        for _ in range(self._steps2(level) - 1):
            u = u + lvl.smoother.vmult(rhs - lvl.matrix.vmult(u))
        return u

    def _post_smooth(self, level: int, u, rhs):
        lvl = self.levels[level]
        if self.params.no_post_smooth:
            return u
        if self.params.no_post_smooth_finest and level == self.max_level:
            return u
        if self.params.skip_identity_levels and \
                isinstance(lvl.smoother, IdentitySmoother):
            return u
        pi = self.params.post_smoother_inner_iterations
        for _ in range(self._steps2(level)):
            r = rhs - lvl.matrix.vmult(u)
            if pi is not None and isinstance(lvl.smoother,
                                             RelaxationSmoother):
                u = u + lvl.smoother.vmult(r, n_iterations=pi)
            else:
                u = u + lvl.smoother.vmult(r)
        return u

    def _project_null(self, x):
        """Remove the coarse-operator nullspace components (per leading
        block index; z is normalized)."""
        z = self.coarse_null.astype(x.dtype)
        flat = x.reshape(x.shape[0], -1)
        flat = flat - (flat @ z)[:, None] * z[None, :]
        return flat.reshape(x.shape)

    def _coarse_solve(self, defect):
        if self.coarse_null is not None:
            defect = self._project_null(defect)
        if self.coarse_Ainv is not None:
            d = defect.astype(jnp.float32).reshape(-1)
            out = (self.coarse_Ainv @ d).reshape(
                defect.shape).astype(self.dtype)
        elif self.params.coarse_grid_smoother_type == "Smoother":
            out = self._apply_smoother(0, defect)
        else:
            lvl = self.levels[0]
            out = gmres_fixed_left(lvl.matrix.vmult, defect,
                                   lvl.smoother.vmult,
                                   self.params.coarse_grid_maxiter)
        if self.coarse_null is not None:
            out = self._project_null(out)
        return out

    def _constrain(self, level: int, x):
        if self.level_shardings is None:
            return x
        s = self.level_shardings[level]
        if s is None:
            return x
        import jax
        return jax.lax.with_sharding_constraint(x, s)

    def _level_v_step(self, level: int, defect):
        if level == 0:
            return self._coarse_solve(defect)
        u = self._apply_smoother(level, defect)
        r = defect - self.levels[level].matrix.vmult(u)
        dc = self._constrain(level - 1, self.transfers[level - 1].restrict(r))
        uc = self._constrain(level - 1, self._level_v_step(level - 1, dc))
        u = u + self._constrain(level,
                                self.transfers[level - 1].prolongate(uc))
        return self._post_smooth(level, u, defect)

    def vmult(self, src):
        """One V-cycle in the preconditioner precision; cast at the boundary
        (reference stmg.h:1331-1344)."""
        out_dtype = src.dtype
        x = src.astype(self.dtype)
        y = self._level_v_step(self.max_level, x)
        return y.astype(out_dtype)

    __call__ = vmult


def _eig_cache_path():
    import os
    p = os.environ.get("STFEM_EIG_CACHE")
    if p == "0":
        return None
    if p:
        return p
    import pathlib
    return str(pathlib.Path(__file__).resolve().parents[2]
               / ".jax_cache" / "eig_cache.json")


def _cached_estimate(m_est, v_est, est_shape, est_mask, est_dtype,
                     n_iterations, safety_factor, device=None,
                     method="power"):
    """estimate_eigenvalues with a repo-local disk memo.

    The power iteration is deterministic (fixed start vector), so the
    estimate is a pure function of the operator/smoother inputs; caching it
    across processes removes the per-level estimate compiles+sweeps that
    dominate warm-start setup (measured ~0.2-3.4 s per level at 8^3).
    Only clean separable levels (uniform mesh, no coefficient, no vertex
    map) are cached -- exactly the ones the proxy path produces."""
    from .smoother import EigInfo

    K = getattr(m_est, "K", None)
    mesh = getattr(K, "mesh", None)
    path = _eig_cache_path()
    cacheable = (
        path is not None and K is not None and mesh is not None
        and getattr(K, "coeff", None) is None
        and getattr(mesh, "_vertices", None) is None
        and getattr(mesh, "cell_mask", None) is None
        and getattr(mesh, "distort", 0.0) == 0.0)
    if not cacheable:
        return estimate_eigenvalues(m_est, v_est, est_shape, est_mask,
                                    est_dtype, n_iterations, safety_factor,
                                    device=device, method=method)
    import hashlib
    import json
    import os
    verts = [np.asarray(mesh.axis_vertices(d)).tobytes()
             for d in range(K.dim)]
    hsh = hashlib.sha256()
    for b in verts:
        hsh.update(b)
    hsh.update(np.asarray(m_est.Alpha, np.float64).tobytes())
    hsh.update(np.asarray(m_est.Beta, np.float64).tobytes())
    hsh.update(repr((K.degree, K.n_q, float(K.laplace_scaling),
                     float(K.mass_scaling), tuple(est_shape),
                     str(np.dtype(est_dtype)), str(np.dtype(m_est.dtype)),
                     int(n_iterations), float(safety_factor),
                     int(getattr(v_est, "n_steps", 1)),
                     str(getattr(v_est, "dtype", "")),
                     str(method),
                     )).encode())
    key = hsh.hexdigest()
    cache = {}
    try:
        with open(path) as f:
            cache = json.load(f)
    except Exception:
        cache = {}
    if key in cache:
        mn, mx = cache[key]
        return EigInfo(min_eigenvalue=mn, max_eigenvalue=mx)
    info = estimate_eigenvalues(m_est, v_est, est_shape, est_mask,
                                est_dtype, n_iterations, safety_factor,
                                device=device, method=method)
    if np.isfinite(info.max_eigenvalue) and info.max_eigenvalue > 0:
        cache[key] = [float(info.min_eigenvalue),
                      float(info.max_eigenvalue)]
        try:
            os.makedirs(os.path.dirname(path), exist_ok=True)
            tmp = path + f".tmp{os.getpid()}"
            with open(tmp, "w") as f:
                json.dump(cache, f)
            os.replace(tmp, path)
        except Exception:
            pass
    return info


def build_stmg(mesh_fine: StructuredMesh, fe_degree: int, space_degree: int,
               type_: TimeStepType, n_timesteps_at_once: int,
               time_step: float, problem: ProblemType = ProblemType.heat,
               params: GMGParams | None = None, dtype=jnp.float32,
               coarsening_type: CoarseningType = CoarseningType.space_and_time,
               time_before_space: bool = False,
               space_time_level_first: bool = False,
               use_pmg: bool = True,
               fe_degree_min: int | None = None,
               n_timesteps_at_once_min: int | None = None,
               space_degree_min: int = 1,
               poly_coarsening=PolynomialCoarseningSequenceType.bisect,
               laplace_coefficient=None, time_only: bool = False,
               eig_device=None, eig_device_min_dofs: int = 50000) -> GMG:
    """Assemble the full STMG hierarchy for a heat/wave cycle.

    Level-ladder conventions follow the reference goldens (tp_01.output):
    the space p-sequence bisects the ACTUAL space degree down to
    space_degree_min=1 (see SURVEY.md section 6 notes on the golden-era
    p-sequence), the time k-sequence bisects fe_degree down to fe_degree_min.
    """
    if params is None:
        params = GMGParams()
    if params.level_bf16:
        dtype = jnp.bfloat16
    is_cgp = type_ == TimeStepType.CGP
    if fe_degree_min is None:
        fe_degree_min = max(fe_degree - 1, 1 if is_cgp else 0)
    if n_timesteps_at_once_min is None:
        n_timesteps_at_once_min = max(n_timesteps_at_once // 2, 1)

    n_sp_lvl = 1 if time_only else mesh_fine.refinement + 1
    if time_only:
        meshes = [mesh_fine]
    elif mesh_fine.distort != 0.0:
        # coarse meshes inherit the fine mesh's distorted vertices (strided)
        meshes = [mesh_fine]
        while meshes[0].refinement > 0:
            meshes.insert(0, meshes[0].coarsened())
    else:
        meshes = [StructuredMesh(mesh_fine.subdivisions, mesh_fine.lower,
                                 mesh_fine.upper, refinement=r)
                  for r in range(n_sp_lvl)]
    poly_time = get_poly_mg_sequence(fe_degree, fe_degree_min,
                                     poly_coarsening)
    poly_space = get_poly_mg_sequence(space_degree, space_degree_min,
                                      poly_coarsening)
    mg_type_level = get_mg_sequence(
        n_sp_lvl, poly_time, poly_space, n_timesteps_at_once,
        n_timesteps_at_once_min, MGType.tau, coarsening_type,
        time_before_space, use_pmg, space_time_level_first)
    precond_seq = get_precondition_stmg_types(
        mg_type_level, coarsening_type, time_before_space,
        space_time_level_first, params.smoother)
    if params.smooth_all_levels:
        precond_seq = [params.smoother] * len(precond_seq)

    if problem == ProblemType.wave:
        fetw = get_fe_time_weights_wave_sequence(
            type_, time_step, n_timesteps_at_once, mg_type_level, poly_time)
    else:
        fetw = get_fe_time_weights_sequence(
            type_, time_step, n_timesteps_at_once, mg_type_level, poly_time)

    n_levels = len(mg_type_level) + 1
    # walk level state from fine to coarse
    mesh_idx = [0] * n_levels
    spd_idx = [0] * n_levels
    n_at_once = [0] * n_levels
    ntd_idx = [0] * n_levels
    mi, si, na, ti = n_sp_lvl - 1, len(poly_space) - 1, \
        n_timesteps_at_once, len(poly_time) - 1
    for l in range(n_levels - 1, -1, -1):
        mesh_idx[l], spd_idx[l], n_at_once[l], ntd_idx[l] = mi, si, na, ti
        if l > 0:
            mgt = mg_type_level[l - 1]
            if mgt == MGType.h:
                mi -= 1
            elif mgt == MGType.p:
                si -= 1
            elif mgt == MGType.k:
                ti -= 1
            elif mgt == MGType.tau:
                na //= 2

    levels = []
    ops_cache = {}
    import os as _os_v
    import time as _time_v
    _verbose = _os_v.environ.get("STFEM_SETUP_VERBOSE") == "1"
    _t_lvl = _time_v.time()
    for l in range(n_levels):
        mesh_l = meshes[mesh_idx[l]]
        deg_l = poly_space[spd_idx[l]]
        key = (mesh_idx[l], deg_l)
        if key not in ops_cache:
            K = LaplaceMassOperator(mesh_l, deg_l, deg_l + 1, 0.0, 1.0,
                                    dtype=dtype,
                                    coefficient=laplace_coefficient)
            M = LaplaceMassOperator(mesh_l, deg_l, deg_l + 1, 1.0, 0.0,
                                    dtype=dtype)
            ops_cache[key] = (K, M)
        K, M = ops_cache[key]
        Alpha_l = fetw[l][0]
        Beta_l = fetw[l][1]
        matrix = SystemMatrix(K, M, Alpha_l, Beta_l, precision=None)
        rt = poly_time[ntd_idx[l]]
        nt_dofs_l = rt + 1 if type_ == TimeStepType.DG else rt
        n_blocks = nt_dofs_l * n_at_once[l]
        lvl = _Level(matrix=matrix, smoother=None, n_blocks=n_blocks,
                     dof_shape=mesh_l.dof_shape(deg_l))
        if precond_seq[l] == SupportedSmoothers.Identity:
            lvl.smoother = IdentitySmoother()
        else:
            vanka = PreconditionVanka(
                K, M, Alpha_l, Beta_l, dtype=dtype,
                storage_dtype=jnp.bfloat16 if params.vanka_bf16 else None,
                n_steps=n_at_once[l])
            if _verbose:
                print(f"#   lvl {l} vanka: {_time_v.time() - _t_lvl:.2f}s",
                      flush=True)
            if params.relaxation == 0.0 or \
                    precond_seq[l] == SupportedSmoothers.Chebyshev:
                if np.sum(K.mask_np) == 0:
                    # degenerate level: every dof Dirichlet-constrained (e.g.
                    # Q1 on the 1-cell base mesh); the operator is zero there
                    # and the defect is always zero -- use omega = 1 like the
                    # reference's estimate_relaxation (transfer_01.cc:268-271)
                    info = None
                else:
                    # big levels: run the jitted power iteration on the
                    # accelerator (one dispatch) -- on the 1-core host the
                    # 20 (vmult + vanka) sweeps dominate the whole setup
                    # (measured 164 s of 200 s at 16^3, scripts/setup_profile)
                    m_est, v_est = matrix, vanka
                    est_shape = (n_blocks,) + tuple(lvl.dof_shape)
                    est_mask = K.mask_np
                    p = params.eig_proxy_cells
                    if (p > 0 and mesh_l.axis_steps is None
                            and getattr(mesh_l, "_vertices", None) is None
                            and mesh_l.distort == 0.0
                            and laplace_coefficient is None
                            and all(int(c) > p for c in mesh_l.cells)):
                        pm = StructuredMesh(
                            [p] * mesh_l.dim, [0.0] * mesh_l.dim,
                            [p * float(mesh_l.h[d])
                             for d in range(mesh_l.dim)], refinement=0)
                        # proxy estimates run host-side; the XLA apply is
                        # what we want there (interpret-mode pallas would
                        # dominate the 20 power sweeps)
                        import os as _os
                        _old_pg = _os.environ.get("STFEM_PALLAS_GRID")
                        _os.environ["STFEM_PALLAS_GRID"] = "0"
                        try:
                            Kp_ = LaplaceMassOperator(pm, deg_l, deg_l + 1,
                                                      0.0, 1.0, dtype=dtype)
                            Mp_ = LaplaceMassOperator(pm, deg_l, deg_l + 1,
                                                      1.0, 0.0, dtype=dtype)
                            m_est = SystemMatrix(Kp_, Mp_, Alpha_l, Beta_l,
                                                 precision=None)
                            v_est = PreconditionVanka(
                                Kp_, Mp_, Alpha_l, Beta_l, dtype=dtype,
                                storage_dtype=(jnp.bfloat16
                                               if params.vanka_bf16
                                               else None),
                                n_steps=n_at_once[l])
                        finally:
                            if _old_pg is None:
                                _os.environ.pop("STFEM_PALLAS_GRID", None)
                            else:
                                _os.environ["STFEM_PALLAS_GRID"] = _old_pg
                        est_shape = (n_blocks,) + tuple(pm.dof_shape(deg_l))
                        est_mask = Kp_.mask_np
                        # shrink the proxy in TIME too: lambda_max(P A) is
                        # S-independent (block-bidiagonal with identical
                        # per-step blocks; measured 1.72531/1.72564/1.72560
                        # at S=1/2/4), so a 2-step proxy reproduces the
                        # estimate at a fraction of the sweep cost -- the
                        # S=32 proxy was the dominant 16^3 setup term
                        struct_p = SystemMatrix._detect_step_structure(
                            np.asarray(Alpha_l), np.asarray(Beta_l))
                        if struct_p is not None and n_at_once[l] > 2:
                            nt_p, A0p, A1p, B0p, B1p = struct_p
                            A2 = np.zeros((2 * nt_p, 2 * nt_p))
                            B2 = np.zeros((2 * nt_p, 2 * nt_p))
                            A2[:nt_p, :nt_p] = A0p
                            A2[nt_p:, nt_p:] = A0p
                            A2[nt_p:, :nt_p] = A1p
                            B2[:nt_p, :nt_p] = B0p
                            B2[nt_p:, nt_p:] = B0p
                            B2[nt_p:, :nt_p] = B1p
                            m_est = SystemMatrix(Kp_, Mp_, A2, B2,
                                                 precision=None)
                            v_est = PreconditionVanka(
                                Kp_, Mp_, A2, B2, dtype=dtype,
                                storage_dtype=(jnp.bfloat16
                                               if params.vanka_bf16
                                               else None), n_steps=2)
                            est_shape = (2 * nt_p,) + tuple(
                                pm.dof_shape(deg_l))
                    n_sp = int(np.prod(est_shape[1:]))
                    use_dev = (eig_device is not None
                               and n_sp >= eig_device_min_dofs)
                    if use_dev:
                        import jax as _jax
                        m_est, v_est = _jax.device_put((m_est, v_est),
                                                       eig_device)
                    # bf16 probe vectors lose the power-iteration norms --
                    # the estimate runs on an f32 probe (the bf16 level ops
                    # promote, so temps stay f32 inside the estimate)
                    est_dtype = (jnp.float32 if params.level_bf16 else dtype)
                    # order-invariant converged Arnoldi for small/proxy
                    # estimates (always host-side); deal.II power
                    # elsewhere, accelerator-backed when big.
                    eig_method = ("arnoldi" if params.eig_exact
                                  and int(np.prod(est_shape))
                                  <= params.eig_exact_max_n else "power")
                    # arnoldi sweeps run host-side (2-step proxies are
                    # small; remote per-level jit compiles cost more than
                    # they save); the accelerator is used for big POWER
                    # estimates only
                    est_device = ((eig_device if use_dev else None)
                                  if eig_method != "arnoldi" else None)
                    info = _cached_estimate(
                        m_est, v_est, est_shape, est_mask, est_dtype,
                        params.smoothing_eig_cg_n_iterations,
                        params.eig_safety_factor,
                        device=est_device,
                        method=eig_method)
                    if not np.isfinite(info.max_eigenvalue) or \
                            info.max_eigenvalue <= 0:
                        info = None
                    if _verbose:
                        print(f"#   lvl {l} eig (proxy={p > 0}, "
                              f"n_sp={n_sp}): "
                              f"{_time_v.time() - _t_lvl:.2f}s", flush=True)
            if precond_seq[l] == SupportedSmoothers.Relaxation:
                if params.relaxation != 0.0:
                    omega = params.relaxation
                elif info is None:
                    omega = 1.0
                else:
                    omega = relaxation_parameters(info,
                                                  params.smoothing_range)
                inner = (params.smoother_inner_iterations
                         if params.smoother_inner_iterations is not None
                         else params.smoothing_steps)
                lvl.smoother = RelaxationSmoother(matrix, vanka, omega,
                                                  inner)
            else:
                if info is None:
                    theta, delta = 1.0, 0.5
                else:
                    theta, delta = chebyshev_parameters(
                        info, params.smoothing_range)
                inner = (params.smoother_inner_iterations
                         if params.smoother_inner_iterations is not None
                         else params.smoothing_steps)
                lvl.smoother = ChebyshevSmoother(matrix, vanka, theta, delta,
                                                 inner)
        levels.append(lvl)
        if _verbose:
            print(f"# build_stmg lvl {l} ("
                  f"{mg_type_level[l - 1] if l else ''} "
                  f"blocks={lvl.n_blocks} "
                  f"dofs={int(np.prod(lvl.dof_shape))} "
                  f"sm={type(lvl.smoother).__name__}): "
                  f"{_time_v.time() - _t_lvl:.2f}s", flush=True)
            _t_lvl = _time_v.time()

    transfers = []
    for l in range(1, n_levels):
        mgt = mg_type_level[l - 1]
        mesh_hi = meshes[mesh_idx[l]]
        mesh_lo = meshes[mesh_idx[l - 1]]
        deg_hi = poly_space[spd_idx[l]]
        deg_lo = poly_space[spd_idx[l - 1]]
        if mgt == MGType.h:
            P1ds = [h_prolongation_global_1d(mesh_lo.cells[d], deg_hi)
                    for d in range(mesh_hi.dim)]
            transfers.append(SpaceTransfer(
                P1ds, mesh_hi.boundary_dof_mask(deg_hi),
                mesh_lo.boundary_dof_mask(deg_lo), dtype))
        elif mgt == MGType.p:
            P1ds = [p_prolongation_global_1d(mesh_hi.cells[d], deg_lo, deg_hi)
                    for d in range(mesh_hi.dim)]
            transfers.append(SpaceTransfer(
                P1ds, mesh_hi.boundary_dof_mask(deg_hi),
                mesh_lo.boundary_dof_mask(deg_lo), dtype))
        else:
            rt_hi = poly_time[ntd_idx[l]]
            rt_lo = poly_time[ntd_idx[l - 1]]
            nt_hi = rt_hi + 1 if type_ == TimeStepType.DG else rt_hi
            nt_lo = rt_lo + 1 if type_ == TimeStepType.DG else rt_lo
            transfers.append(TimeTransfer(
                type_, mgt, nt_hi, nt_lo, n_at_once[l],
                params.restrict_is_transpose_prolongate, dtype))

    gmg = GMG(levels, transfers, params, dtype, precond_seq)
    gmg.mg_type_level = mg_type_level
    return gmg


def build_stmg_stokes(mesh_fine: StructuredMesh, fe_degree: int,
                      type_: TimeStepType, n_timesteps_at_once: int,
                      time_step: float, viscosity: float = 1.0,
                      params: GMGParams | None = None, dtype=jnp.float32,
                      coarsening_type: CoarseningType =
                      CoarseningType.space_and_time,
                      time_before_space: bool = False,
                      space_time_level_first: bool = False,
                      use_pmg: bool = True,
                      fe_degree_min: int | None = None,
                      fe_degree_min_space: int | None = None,
                      n_timesteps_at_once_min: int | None = None,
                      poly_coarsening=PolynomialCoarseningSequenceType.bisect,
                      weak_faces=(), free_faces=(),
                      dg_pressure: bool = True,
                      weak_obstacle: bool = False) -> GMG:
    """STMG hierarchy for the Stokes slab system on the flat [T, n_u+n_p]
    layout (reference tests/tp_03stokes.cc level setup): velocity Q_{k+1}
    with pressure DGP(k) -- or, with dg_pressure=False, the Taylor-Hood
    pair with CONTINUOUS Q_k pressure (reference dGPressure switch,
    tp_03stokes.cc:81-87) -- per level, block Vanka with velocity-only mass
    mask.  FE_Q keeps velocity >= Q2 on all p-levels so the nodal pressure
    stays >= Q1."""
    from ..blocks import BlockSlice
    from ..ops.stokes import StokesOperator
    from ..system_stokes import StokesSystemMatrix
    from ..time.tables import (get_fe_time_weights_sequence,
                               get_fe_time_weights_stokes)
    from .stokes_level import (StokesSpaceTransfer, StokesTimeTransfer,
                               StokesVanka)

    if params is None:
        params = GMGParams()
    if fe_degree_min is None:
        fe_degree_min = max(fe_degree - 1, 1)
    if n_timesteps_at_once_min is None:
        n_timesteps_at_once_min = max(n_timesteps_at_once // 2, 1)

    u_degree = fe_degree + 1
    n_sp_lvl = mesh_fine.refinement + 1
    meshes = []
    for r in range(n_sp_lvl):
        cm = mesh_fine.cell_mask
        if cm is not None:
            stride = 2 ** (mesh_fine.refinement - r)
            cm = cm[tuple(slice(None, None, stride)
                          for _ in range(mesh_fine.dim))]
        meshes.append(StructuredMesh(
            mesh_fine.subdivisions, mesh_fine.lower, mesh_fine.upper,
            refinement=r, cell_mask=cm,
            axis_steps=[np.asarray(st).reshape(-1, 2 ** mesh_fine.refinement)
                        [:, 0] * 2 ** mesh_fine.refinement
                        for st in mesh_fine.axis_steps]
            if mesh_fine.axis_steps is not None else None,
            vertex_map=mesh_fine.vertex_map,
            map_exact=mesh_fine.map_exact))
    poly_time = get_poly_mg_sequence(fe_degree, fe_degree_min,
                                     poly_coarsening)
    # the space p-ladder coarsens the PRESSURE degree down to
    # fe_degree_min_space (default fe_degree_min; reference
    # parameters.h:174-175, tp_03stokes.cc:298-300) -- velocity is always
    # pressure+1, so it never drops below Q2.  Coarsening the velocity
    # degree directly to Q1 (pre-round-4 behavior) adds one Q1/DGP0 level
    # whose Vanka-preconditioned operator has negative-real-part
    # eigenmodes in 3D: the V-cycle then amplifies pressure modes
    # (rho(I-PA) 1.32 at 4^3 with that level, 1.00 without --
    # scripts/stokes3d_lab.py `ladder`)
    if fe_degree_min_space is None:
        fe_degree_min_space = fe_degree_min
    poly_space_p = get_poly_mg_sequence(u_degree - 1,
                                        max(int(fe_degree_min_space), 1),
                                        poly_coarsening)
    poly_space = [p + 1 for p in poly_space_p]
    mg_type_level = get_mg_sequence(
        n_sp_lvl, poly_time, poly_space, n_timesteps_at_once,
        n_timesteps_at_once_min, MGType.tau, coarsening_type,
        time_before_space, use_pmg, space_time_level_first)
    precond_seq = get_precondition_stmg_types(
        mg_type_level, coarsening_type, time_before_space,
        space_time_level_first, params.smoother)
    if params.smooth_all_levels:
        precond_seq = [params.smoother] * len(precond_seq)

    fetw = get_fe_time_weights_sequence(
        type_, time_step, n_timesteps_at_once, mg_type_level, poly_time)
    fetw_stokes = get_fe_time_weights_sequence(
        type_, time_step, n_timesteps_at_once, mg_type_level, poly_time,
        weight_fn=get_fe_time_weights_stokes)

    n_levels = len(mg_type_level) + 1
    mesh_idx = [0] * n_levels
    spd_idx = [0] * n_levels
    n_at_once = [0] * n_levels
    ntd_idx = [0] * n_levels
    mi, si, na, ti = n_sp_lvl - 1, len(poly_space) - 1, \
        n_timesteps_at_once, len(poly_time) - 1
    for l in range(n_levels - 1, -1, -1):
        mesh_idx[l], spd_idx[l], n_at_once[l], ntd_idx[l] = mi, si, na, ti
        if l > 0:
            mgt = mg_type_level[l - 1]
            if mgt == MGType.h:
                mi -= 1
            elif mgt == MGType.p:
                si -= 1
            elif mgt == MGType.k:
                ti -= 1
            elif mgt == MGType.tau:
                na //= 2

    levels = []
    sop_cache = {}
    for l in range(n_levels):
        mesh_l = meshes[mesh_idx[l]]
        u_deg = poly_space[spd_idx[l]]
        p_deg = u_deg - 1
        rt = poly_time[ntd_idx[l]]
        nt_dofs_l = rt + 1 if type_ == TimeStepType.DG else rt
        key = (mesh_idx[l], u_deg)
        if key not in sop_cache:
            S = StokesOperator(mesh_l, u_deg, p_deg, u_deg + 1, viscosity,
                               dtype=dtype, weak_faces=weak_faces,
                               free_faces=free_faces,
                               dg_pressure=dg_pressure,
                               weak_obstacle=weak_obstacle)
            Mu = LaplaceMassOperator(mesh_l, u_deg, u_deg + 1, 1.0, 0.0,
                                     dtype=dtype, mask=S.mask_u_np)
            sop_cache[key] = (S, Mu)
        S, Mu = sop_cache[key]
        a_l, b_l = fetw[l][0], fetw[l][1]
        matrix = StokesSystemMatrix(S, Mu, a_l, b_l, type_=type_,
                                    precision=None)
        blk = BlockSlice(n_at_once[l], 2, nt_dofs_l)
        T_l = n_at_once[l] * nt_dofs_l
        lvl = _Level(matrix=matrix, smoother=None, n_blocks=T_l,
                     dof_shape=(S.n_u + S.n_p,))
        if precond_seq[l] == SupportedSmoothers.Identity:
            lvl.smoother = IdentitySmoother()
        else:
            vanka = StokesVanka(S, Mu, fetw_stokes[l][0], fetw_stokes[l][1],
                                blk, dtype=dtype)
            p_mask = (np.ones(S.n_p) if dg_pressure
                      else np.asarray(S.mask_p_np).reshape(-1))
            flat_mask = np.concatenate(
                [np.tile(np.asarray(S.mask_u_np).reshape(-1), S.dim),
                 p_mask])
            if np.sum(S.mask_u_np) == 0:
                info = None
            else:
                # Stokes keeps the deal.II power estimate: the saddle-point
                # P A spectrum is complex-valued and the heat-calibrated
                # "converged |lambda|, no safety factor" rule over-relaxes
                # (measured: tf01stokes ref 1 regressed 12 -> 16 iters vs
                # golden 12 under arnoldi; power matches/undershoots golden)
                info = estimate_eigenvalues(
                    matrix, vanka, (T_l, S.n_u + S.n_p), flat_mask, dtype,
                    params.smoothing_eig_cg_n_iterations,
                    params.eig_safety_factor, method="power")
                if not np.isfinite(info.max_eigenvalue) or \
                        info.max_eigenvalue <= 0:
                    info = None
            if precond_seq[l] == SupportedSmoothers.Relaxation:
                if params.relaxation != 0.0:
                    omega = params.relaxation
                elif info is None:
                    omega = 1.0
                else:
                    omega = relaxation_parameters(info,
                                                  params.smoothing_range)
                inner = (params.smoother_inner_iterations
                         if params.smoother_inner_iterations is not None
                         else params.smoothing_steps)
                lvl.smoother = RelaxationSmoother(matrix, vanka, omega,
                                                  inner)
            else:
                theta, delta = ((1.0, 0.5) if info is None else
                                chebyshev_parameters(info,
                                                     params.smoothing_range))
                inner = (params.smoother_inner_iterations
                         if params.smoother_inner_iterations is not None
                         else params.smoothing_steps)
                lvl.smoother = ChebyshevSmoother(matrix, vanka, theta, delta,
                                                 inner)
        levels.append(lvl)

    transfers = []
    for l in range(1, n_levels):
        mgt = mg_type_level[l - 1]
        S_hi = sop_cache[(mesh_idx[l], poly_space[spd_idx[l]])][0]
        S_lo = sop_cache[(mesh_idx[l - 1], poly_space[spd_idx[l - 1]])][0]
        mesh_hi = meshes[mesh_idx[l]]
        mesh_lo = meshes[mesh_idx[l - 1]]
        deg_hi = poly_space[spd_idx[l]]
        deg_lo = poly_space[spd_idx[l - 1]]
        if mgt in (MGType.h, MGType.p):
            if mgt == MGType.h:
                P1ds = [h_prolongation_global_1d(mesh_lo.cells[d], deg_hi)
                        for d in range(mesh_hi.dim)]
            else:
                P1ds = [p_prolongation_global_1d(mesh_hi.cells[d], deg_lo,
                                                 deg_hi)
                        for d in range(mesh_hi.dim)]
            ut = SpaceTransfer(P1ds, S_hi.mask_u_np, S_lo.mask_u_np, dtype)
            pt = None
            if not dg_pressure:
                kp_hi, kp_lo = deg_hi - 1, deg_lo - 1
                if mgt == MGType.h:
                    P1ds_p = [h_prolongation_global_1d(mesh_lo.cells[d],
                                                       kp_hi)
                              for d in range(mesh_hi.dim)]
                else:
                    P1ds_p = [p_prolongation_global_1d(mesh_hi.cells[d],
                                                       kp_lo, kp_hi)
                              for d in range(mesh_hi.dim)]
                pt = SpaceTransfer(P1ds_p, S_hi.mask_p_np, S_lo.mask_p_np,
                                   dtype)
            transfers.append(StokesSpaceTransfer(
                S_hi, S_lo, ut, "h" if mgt == MGType.h else "p", dtype,
                p_transfer=pt))
        else:
            rt_hi = poly_time[ntd_idx[l]]
            rt_lo = poly_time[ntd_idx[l - 1]]
            nt_hi = rt_hi + 1 if type_ == TimeStepType.DG else rt_hi
            nt_lo = rt_lo + 1 if type_ == TimeStepType.DG else rt_lo
            transfers.append(StokesTimeTransfer(TimeTransfer(
                type_, mgt, nt_hi, nt_lo, n_at_once[l],
                params.restrict_is_transpose_prolongate, dtype)))

    # Stokes coarse solves route to the assembled pseudo-inverse whenever
    # the coarse system fits: the coarsest saddle system is SINGULAR
    # (enclosed-flow constant pressure, plus inf-sup-degenerate pressure
    # directions on very coarse grids where B has fewer rows than pressure
    # modes).  Both of the reference's coarse options amplify those
    # near-null directions by O(1/sigma) in our composition -- measured
    # lambda(PA) ~ -1.3e6 with the Vanka-smoother coarse apply on the
    # tf01stokes 1-cell coarse level (driver stall at rel 1e-3) and
    # rho(I-PA) 1.32 in 3D with the GMRES(10) coarse -- while the exact
    # pinv solve yields 8/9 iterations vs the 12/12 goldens and a clean
    # spectrum (scripts/stokes_spectrum_lab.py, stokes3d_lab.py).  One
    # assembled pinv matmul is also the TPU-natural coarse solver (no
    # sequential Krylov/smoother chain on-device); iteration counts stay
    # AT OR BELOW the reference goldens, which the one-sided parity bound
    # allows.
    n_coarse = levels[0].n_blocks * int(np.prod(levels[0].dof_shape))
    if n_coarse <= GMG.DIRECT_COARSE_MAX and not params.coarse_direct_pinv:
        import dataclasses
        params = dataclasses.replace(params,
                                     coarse_grid_smoother_type="Direct",
                                     coarse_direct_pinv=True)
    gmg = GMG(levels, transfers, params, dtype, precond_seq)
    gmg.mg_type_level = mg_type_level
    if not free_faces:
        # enclosed flow: the (coarse) operator is singular along the
        # per-time-block constant-pressure mode (the reference leaves it
        # free and subtracts the mean in POST-processing,
        # tp_03stokes.cc:1047-1061).  Project it out of the coarse
        # defect/solution -- see GMG.coarse_null.
        S0 = sop_cache[(mesh_idx[0], poly_space[spd_idx[0]])][0]
        if dg_pressure:
            zp = np.zeros((int(np.prod(S0.cells)), S0.n_ploc_cell))
            zp[:, 0] = 1.0       # DGP mode 0 = constant
        else:
            zp = np.asarray(S0.mask_p_np, np.float64).reshape(-1)
        z = np.concatenate([np.zeros(S0.n_u), zp.reshape(-1)])
        gmg.coarse_null = jnp.asarray(z / np.linalg.norm(z), dtype)
    return gmg
