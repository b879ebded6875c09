"""Cell-wise Vanka patch smoother, TPU-native.

The reference extracts per-cell submatrices of the assembled (Trilinos) K and
M, builds the space-time patch matrix B = Alpha (x) K_loc + Beta (x) M_loc,
row-scales by dof valence and inverts with Gauss-Jordan at setup; apply is
gather residual -> dense solve -> scatter-add (include/stmg.h:619-907).

Here there is no sparse-matrix library at all: element matrices come straight
from quadrature (ops.spatial.element_matrices), the assembled coupling is
reconstructed on-device in a dense *banded* form indexed by per-axis offsets
in [-k, k], patches are one gather away, and the inverses are one batched
jnp.linalg.inv -- everything dense, batched, MXU-shaped.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.spatial import LaplaceMassOperator, cell_gather, cell_scatter
from ..utils.module import register_module


def _band_offsets(dim: int, k: int) -> np.ndarray:
    """All per-axis offset tuples in [-k, k]^dim, flattened index order."""
    ax = np.arange(-k, k + 1)
    grids = np.meshgrid(*([ax] * dim), indexing="ij")
    return np.stack([g.reshape(-1) for g in grids], axis=-1)  # (n_off, dim)


def _band_flat(op: LaplaceMassOperator, flat_idx: jnp.ndarray,
               extra_E: jnp.ndarray | None = None) -> jnp.ndarray:
    """Flattened banded assembled matrix (jit-traceable).  extra_E: optional
    per-cell additions (e.g. Nitsche face terms on boundary-layer cells)."""
    k, dim = op.degree, op.dim
    E = op.element_matrices()  # (C, A, A) with constrained rows/cols zeroed
    if extra_E is not None:
        E = E + extra_E
    dof_shape = op.dof_shape
    n_off = (2 * k + 1) ** dim
    band = jnp.zeros(int(np.prod(dof_shape)) * n_off, op.dtype)
    band = band.at[flat_idx.reshape(-1)].add(E.reshape(-1))
    band = band.reshape(dof_shape + (n_off,))
    center = int((n_off - 1) // 2)
    band = band.at[..., center].add(1.0 - op.mask)
    return band.reshape(-1)


def assemble_band(op: LaplaceMassOperator) -> jnp.ndarray:
    """Assembled global matrix in banded form:
    band[*dofshape, n_off] = A[g, g + offset], with unit diagonal on
    constrained dofs.  n_off = (2k+1)^dim."""
    from ..utils.native import band_indices
    flat_idx = jnp.asarray(band_indices(op.cells, op.degree))
    n_off = (2 * op.degree + 1) ** op.dim
    return _band_flat(op, flat_idx).reshape(op.dof_shape + (n_off,))


def extract_patches(band: jnp.ndarray, cells: tuple[int, ...],
                    k: int) -> jnp.ndarray:
    """Patch submatrices P[C, A, A] = A_assembled[cell dofs x cell dofs]."""
    dim = len(cells)
    A = (k + 1) ** dim
    n_off = (2 * k + 1) ** dim
    dof_shape = band.shape[:-1]
    loc = np.stack(np.meshgrid(*([np.arange(k + 1)] * dim), indexing="ij"),
                   -1).reshape(A, dim)
    C = int(np.prod(cells))
    cell_idx = np.stack(np.meshgrid(*[np.arange(c) for c in cells],
                                    indexing="ij"), -1).reshape(C, dim)
    dof_strides = np.cumprod([1] + list(dof_shape[::-1]))[::-1][1:]
    gidx = ((cell_idx[:, None, :] * k + loc[None, :, :])
            * dof_strides[None, None, :]).sum(-1)       # (C, A)
    off = loc[None, :, :] - loc[:, None, :] + k
    off_strides = np.cumprod([1] + [2 * k + 1] * (dim - 1))[::-1]
    off_flat = (off * off_strides[None, None, :]).sum(-1)  # (A, A)
    flat_idx = gidx[:, :, None] * n_off + off_flat[None, :, :]
    return band.reshape(-1)[jnp.asarray(flat_idx)]      # (C, A, A)


def dof_valence(cells: tuple[int, ...], k: int) -> np.ndarray:
    """Number of cells containing each dof (the reference's valence vector,
    stmg.h:676-689); computed by the native runtime when available."""
    from ..utils.native import dof_valence as _native_valence
    return _native_valence(cells, k)


def separable_eigenbasis(K_op: LaplaceMassOperator,
                         M_op: LaplaceMassOperator):
    """Per-axis Kronecker factorization of the patch generalized eigenbasis
    (classic fast diagonalization, Lynch-Rice-Thomas).

    On an axis-aligned tensor mesh without coefficient the assembled global
    matrices are Kronecker sums of 1D assembled matrices, so every patch
    inherits  K_loc = sum_e (x)_d A1_d,  M_loc = (x)_d M1_d  with 1D factors
    that depend only on the cell's POSITION along each axis.  Solving the
    tiny ((k+1) x (k+1)) per-axis generalized eigenproblems on the FREE
    (unconstrained) 1D dofs gives V = (x)_d V_d with V^T M_loc V = I and
    V^T K_loc V = diag(sum_d lam_d) -- exactly the basis the dense batched
    eigh computes, at O(cells_d (k+1)^3) host cost instead of a batched
    C x (k+1)^dim eigh, and with V stored as per-axis factors (KB instead of
    C A^2 floats; the V application in vmult becomes sum-factorized).

    Constrained handling: constrained 1D columns are unit vectors with a
    placeholder eigenvalue (1/dim).  Any product eigenvector touching a
    constrained axis spans only constrained dofs, where the gathered
    residual is identically zero, so its (arbitrary) eigenvalue and the
    missing cross-block M-orthonormality never enter the applied operator --
    the result equals the dense construction exactly on the reachable
    subspace (asserted by the fastdiag<->sep parity test).

    Returns (lam [C, A] float64, V_axes list of [cells_d, k+1, k+1] float64)
    or None when the operators are not separable (mapped geometry, variable
    coefficient, cell-masked mesh, or non-default Dirichlet masks).
    """
    import scipy.linalg

    mesh = K_op.mesh
    k, dim = K_op.degree, K_op.dim
    if (K_op.jinv is not None or K_op.coeff is not None
            or M_op.coeff is not None
            or getattr(mesh, "cell_mask", None) is not None
            or getattr(mesh, "_vertices", None) is not None):
        return None
    default_mask = mesh.boundary_dof_mask(k)
    if not (np.array_equal(K_op.mask_np, default_mask)
            and np.array_equal(M_op.mask_np, default_mask)):
        return None

    from ..mesh.grid import StructuredMesh

    lam_axes, v_axes = [], []
    for d in range(dim):
        verts = mesh.axis_vertices(d)
        steps = np.diff(verts)
        uniform = np.allclose(steps, steps[0])
        if uniform:
            mesh1 = StructuredMesh([int(mesh.cells[d])], [float(verts[0])],
                                   [float(verts[-1])], refinement=0)
        else:
            mesh1 = StructuredMesh([len(steps)], [float(verts[0])], None,
                                   refinement=0, axis_steps=[steps])
        K1 = LaplaceMassOperator(mesh1, k, K_op.n_q, 0.0, 1.0,
                                 dtype=jnp.float64)
        M1 = LaplaceMassOperator(mesh1, k, K_op.n_q, 1.0, 0.0,
                                 dtype=jnp.float64)
        Kp = np.asarray(extract_patches(assemble_band(K1), mesh1.cells, k))
        Mp = np.asarray(extract_patches(assemble_band(M1), mesh1.cells, k))
        mask1 = np.asarray(mesh1.boundary_dof_mask(k))
        nc = int(mesh.cells[d])
        lam_d = np.full((nc, k + 1), 1.0 / dim)
        V_d = np.zeros((nc, k + 1, k + 1))
        for c in range(nc):
            free = mask1[c * k:c * k + k + 1] > 0.0
            idx = np.where(free)[0]
            cidx = np.where(~free)[0]
            if len(idx):
                w, v = scipy.linalg.eigh(Kp[c][np.ix_(idx, idx)],
                                         Mp[c][np.ix_(idx, idx)])
                lam_d[c, idx] = w
                V_d[c][np.ix_(idx, idx)] = v
            V_d[c][cidx, cidx] = 1.0
        lam_axes.append(lam_d)
        v_axes.append(V_d)

    shape = tuple(int(c) for c in mesh.cells) + (k + 1,) * dim
    lam = np.zeros(shape)
    for d in range(dim):
        s = [1] * (2 * dim)
        s[d] = mesh.cells[d]
        s[dim + d] = k + 1
        lam = lam + lam_axes[d].reshape(s)
    C = int(np.prod(mesh.cells))
    return lam.reshape(C, (k + 1) ** dim), v_axes


@register_module
class PreconditionVanka:
    """Additive-Schwarz cell-patch preconditioner over the space-time slab.

    B_c = Alpha (x) K_loc_c + Beta (x) M_loc_c (block-major rows: block index
    major, cell dof minor -- the reference's layout, stmg.h:820-827),
    row-scaled by valence.

    Two application modes:
      * mode="fastdiag" (default): TPU-first factorization exploiting the
        Kronecker patch structure.  With the generalized eigenbasis
        K_loc V = M_loc V diag(lam), V^T M_loc V = I, the patch inverse is
            B^{-1} = (I (x) V) [per-i (lam_i Alpha + Beta)^{-1}] (I (x) V^T),
        so storage is V (A^2) + per-eigenvalue T x T inverses instead of the
        dense (T A)^2 inverse: ~T^2/2x less memory and fewer flops per apply.
        Valence row scaling commutes: (D B)^{-1} = B^{-1} D^{-1} with the
        diagonal D applied to the gathered residual.
      * mode="dense": the reference-style dense batched inverse.

    Multi-step (n_timesteps_at_once > 1) fastdiag refinement: the slab tables
    are block-bidiagonal with IDENTICAL per-step blocks and a RANK-1 coupling
    (only the previous step's last time dof enters, fe_time.h:381-402), so
        (lam Alpha + Beta) x = r
    decouples into per-step solves  x_s = G^{-1} r_s + x_{s-1}[last] c  with
    G = lam a + b (nt x nt), c = G^{-1}(lam g + z), and the scalar recurrence
        x_s[last] = (G^{-1} r_s)[last] + kappa x_{s-1}[last],  kappa = c[last]
    evaluated by an O(log S) associative scan.  Storage drops from
    C*A*(S*nt)^2 to C*A*nt^2 (S^2 x less) and the per-apply flops by S x; the
    tiny per-step factors always stay in the working dtype, which also
    removes the bf16 dynamic-range failure observed for big T x T inverses.
    """

    def __init__(self, K_op: LaplaceMassOperator, M_op: LaplaceMassOperator,
                 Alpha, Beta, dtype=None, mode: str = "fastdiag",
                 storage_dtype=None, n_steps: int = 1):
        """storage_dtype (e.g. jnp.bfloat16) stores the patch factors at
        reduced precision -- measured to cost ZERO extra FGMRES iterations
        while halving smoother memory/bandwidth (compute stays f32 through
        jnp type promotion)."""
        self.K_op = K_op
        self.mesh = K_op.mesh
        self.cells = K_op.cells
        self.k = K_op.degree
        self.dim = K_op.dim
        self.dtype = dtype or K_op.dtype
        Alpha = np.asarray(Alpha)
        Beta = np.asarray(Beta)
        self.n_blocks = Alpha.shape[0]

        self.mode = mode
        # detect the block-bidiagonal rank-1 multi-step structure (see class
        # docstring); falls back to the dense T x T eigen-solve when absent
        # (e.g. the wave tables' lower-triangular cross-step coupling)
        self.n_steps = 1
        a_nt = b_nt = g_nt = z_nt = None
        if mode == "fastdiag" and n_steps > 1 \
                and self.n_blocks % n_steps == 0:
            nt = self.n_blocks // n_steps
            a_nt = Alpha[:nt, :nt]
            b_nt = Beta[:nt, :nt]
            g_nt = -Alpha[nt:2 * nt, nt - 1]
            z_nt = -Beta[nt:2 * nt, nt - 1]
            A_rec = np.zeros_like(Alpha)
            B_rec = np.zeros_like(Beta)
            for s in range(n_steps):
                sl = slice(s * nt, (s + 1) * nt)
                A_rec[sl, sl] = a_nt
                B_rec[sl, sl] = b_nt
                if s + 1 < n_steps:
                    nsl = slice((s + 1) * nt, (s + 2) * nt)
                    A_rec[nsl, s * nt + nt - 1] = -g_nt
                    B_rec[nsl, s * nt + nt - 1] = -z_nt
            if np.array_equal(A_rec, Alpha) and np.array_equal(B_rec, Beta):
                self.n_steps = n_steps
            else:
                a_nt = None
        from ..utils.native import band_indices
        val = dof_valence(self.cells, self.k)
        A_ = jnp.asarray(Alpha, self.dtype)
        B_ = jnp.asarray(Beta, self.dtype)
        n_blocks = self.n_blocks
        cells, k, dtype = self.cells, self.k, self.dtype

        # the whole heavy build (element matrices -> banded assembly -> patch
        # extraction -> Kronecker patch matrices -> batched inversion) is ONE
        # jitted program: fast on CPU and TPU alike, no eager-op dispatch
        def build(K_op_, M_op_, fidx, vloc, A__, B__):
            Kp = _band_flat(K_op_, fidx)[fidx]         # (C, A, A) patches
            Mp = _band_flat(M_op_, fidx)[fidx]
            B = (jnp.einsum("ij,cab->ciajb", A__, Kp.astype(dtype))
                 + jnp.einsum("ij,cab->ciajb", B__, Mp.astype(dtype)))
            C, A = Kp.shape[0], Kp.shape[1]
            B = B.reshape(C, n_blocks * A, n_blocks * A)
            # valence row scaling (reference compute_block_matrix.h:134-137)
            vrows = jnp.tile(vloc, (1, n_blocks))
            B = B * vrows[:, :, None]
            # unit diagonal on fully-decoupled rows (degenerate coarse lvls)
            zero_rows = (jnp.max(jnp.abs(B), axis=2) == 0.0).astype(dtype)
            B = B + jax.vmap(jnp.diag)(zero_rows)
            return jnp.linalg.inv(B)

        def _eigenbasis(K_op_, M_op_, fidx):
            Kp = _band_flat(K_op_, fidx)[fidx].astype(dtype)
            Mp = _band_flat(M_op_, fidx)[fidx].astype(dtype)
            # generalized symmetric-definite eigenproblem per patch:
            # M = L L^T;  C = L^{-1} K L^{-T};  C Q = Q diag(lam);
            # V = L^{-T} Q  =>  V^T M V = I, V^T K V = diag(lam)
            L = jnp.linalg.cholesky(Mp)
            Linv = jax.vmap(
                lambda l: jax.scipy.linalg.solve_triangular(
                    l, jnp.eye(l.shape[0], dtype=dtype), lower=True))(L)
            Cmat = jnp.einsum("cab,cbd,ced->cae", Linv, Kp, Linv)
            Cmat = 0.5 * (Cmat + jnp.swapaxes(Cmat, 1, 2))
            lam, Q = jnp.linalg.eigh(Cmat)
            V = jnp.einsum("cba,cbq->caq", Linv, Q)  # L^{-T} Q
            return lam, V

        def build_fastdiag(K_op_, M_op_, fidx, vloc, A__, B__):
            lam, V = _eigenbasis(K_op_, M_op_, fidx)
            # per-eigenvalue T x T inverses of (lam_i Alpha + Beta)
            TT = (lam[:, :, None, None] * A__[None, None]
                  + B__[None, None])
            TTinv = jnp.linalg.inv(TT)                 # (C, A, T, T)
            dinv = 1.0 / jnp.tile(vloc, (1, n_blocks))  # (C, T*A)
            return V, TTinv, dinv

        def build_fastdiag_scan(K_op_, M_op_, fidx, vloc, a__, b__, g__, z__):
            lam, V = _eigenbasis(K_op_, M_op_, fidx)
            # per-step nt x nt inverses + rank-1 coupling vector
            G = lam[:, :, None, None] * a__[None, None] + b__[None, None]
            Ginv = jnp.linalg.inv(G)                   # (C, A, nt, nt)
            gz = lam[:, :, None] * g__[None, None] + z__[None, None]
            cvec = jnp.einsum("cqij,cqj->cqi", Ginv, gz)  # (C, A, nt)
            dinv = 1.0 / jnp.tile(vloc, (1, n_blocks))  # (C, T*A)
            return V, Ginv, cvec, dinv

        C = int(np.prod(cells))
        A = (k + 1) ** self.dim
        vloc = cell_gather(jnp.asarray(val, dtype), cells, k).reshape(C, A)
        self.Ginv = self.cvec = None
        # separable (per-axis Kronecker) eigenbasis when the operators allow
        # it: no big batched eigh at setup, per-axis V factors instead of the
        # dense C x A x A basis, sum-factorized V application in vmult
        self.Vsep = None
        sep = None
        import os as _os
        if mode == "fastdiag" and _os.environ.get(
                "STFEM_NO_SEP_VANKA") != "1":
            sep = separable_eigenbasis(K_op, M_op)
        self.Wdn = self.Wup = None
        self.GinvT = self.cvecT = self.TTg = None
        self.pallas_grid = False
        if sep is not None and _os.environ.get(
                "STFEM_GRID_VANKA", "1") != "0":
            # GRID apply mode (TPU-first): fold take-gather, the valence
            # scaling D^{-1}, and the per-axis eigenbasis V_d into ONE
            # global banded matmul per axis ((nc*(k+1)) x (nc*k+1)); the
            # transposed matrices perform the overlap-add scatter on the
            # MXU.  The per-position time solve runs on a FLAT trailing
            # axis (elementwise per position, so ordering is free -- the
            # naive interleaved layout's (k+1)-sized trailing axis wastes
            # 96% of each TPU vector tile and measured 7x SLOWER than the
            # cell-major path; flat is layout-perfect).
            lam_np, v_axes = sep
            sdt = storage_dtype if storage_dtype is not None else dtype
            # the per-step time-solve factors stay f32 even for bf16 level
            # dtype: bf16 per-step recurrences lose the associative scan
            # (the round-1 multi-step NaN); only the big down/up matmul
            # matrices ride at reduced precision
            fdt = (jnp.float32 if np.dtype(dtype) == np.dtype(jnp.bfloat16)
                   else dtype)
            Wdn, Wup = [], []
            for d in range(self.dim):
                nc = int(cells[d])
                nd = nc * k + 1
                v1 = np.ones(nd)
                v1[k:nd - 1:k] = 2.0
                Vd = np.asarray(v_axes[d])
                dn = np.zeros((nc * (k + 1), nd))
                up = np.zeros((nd, nc * (k + 1)))
                for c in range(nc):
                    rows = slice(c * (k + 1), (c + 1) * (k + 1))
                    colsg = slice(c * k, c * k + k + 1)
                    dn[rows, colsg] = Vd[c].T / v1[colsg][None, :]
                    up[colsg, rows] += Vd[c]
                Wdn.append(jnp.asarray(dn, sdt))
                Wup.append(jnp.asarray(up, sdt))
            self.Wdn, self.Wup = Wdn, Wup
            # fused per-block Pallas chains when the per-block working set
            # fits VMEM (TPU; interpret-mode on CPU only when forced) --
            # their down output is in REVERSED axis order, so the
            # per-position factors are built in the matching order
            from ..ops.pallas_grid import factor_perm, fits_vmem
            pg_default = "0"  # measured slower than the XLA grid path
            self.pallas_grid = (
                _os.environ.get("STFEM_PALLAS_GRID", pg_default) == "1"
                and self.dim in (2, 3)
                and int(np.prod(K_op.dof_shape)) >= int(_os.environ.get(
                    "STFEM_PALLAS_MIN_DOFS", "16384"))
                and fits_vmem(K_op.dof_shape, Wdn, dtype))
            lam_grid = lam_np.reshape(tuple(int(c) for c in cells)
                                      + (k + 1,) * self.dim)
            if self.pallas_grid:
                perm = factor_perm(self.dim)
            else:
                # flat interleaved (c1,a1,c2,a2,...) order
                perm = []
                for d in range(self.dim):
                    perm += [d, self.dim + d]
            lam_il = jnp.asarray(
                np.transpose(lam_grid, perm).reshape(-1), fdt)
            # fused Pallas time-solve (TPU only, via platform_dependent):
            # the elementwise multi-step solve is HBM-bound in XLA form
            # (~4 S*nt*N f32 temporaries); the kernel keeps each lane tile
            # in VMEM -- measured 6.5 -> 1.1 ms at 16^3 ntao=32
            self._ts_tile = None
            if (self.n_steps > 1
                    and np.dtype(dtype) != np.dtype(np.float64)
                    and _os.environ.get(
                        "STFEM_PALLAS_TIMESOLVE", "1") != "0"):
                from ..ops.pallas_timesolve import pick_tile
                self._ts_tile = pick_tile(
                    int(np.prod([int(cells[d]) * (k + 1)
                                 for d in range(self.dim)])),
                    self.n_steps, self.n_blocks // self.n_steps,
                    np.dtype(dtype).itemsize)
            if self.n_steps > 1:
                a__ = jnp.asarray(a_nt, fdt)
                b__ = jnp.asarray(b_nt, fdt)
                g__ = jnp.asarray(g_nt, fdt)
                z__ = jnp.asarray(z_nt, fdt)

                def grid_factors(lam_):
                    G = lam_[:, None, None] * a__ + b__
                    Ginv = jnp.linalg.inv(G)               # (N, nt, nt)
                    gz = lam_[:, None] * g__ + z__
                    cvec = jnp.einsum("nij,nj->ni", Ginv, gz)
                    return jnp.transpose(Ginv, (1, 2, 0)), cvec.T

                self.GinvT, self.cvecT = jax.jit(grid_factors)(lam_il)
            else:
                self.TTg = jax.jit(lambda lam_: jnp.transpose(
                    jnp.linalg.inv(lam_[:, None, None] * A_.astype(fdt)
                                   + B_.astype(fdt)),
                    (1, 2, 0)))(lam_il)
            self.V = self.Vsep = self.Binv = None
            self.Ginv = self.cvec = self.TTinv = self.dinv = None
            return
        assert np.dtype(self.dtype) != np.dtype(jnp.bfloat16), \
            "bf16 Vanka dtype (GMGParams.level_bf16) requires the grid " \
            "apply mode (separable eigenbasis + STFEM_GRID_VANKA); the " \
            "dense builds are not bf16-safe"
        if sep is not None and _os.environ.get(
                "STFEM_SEP_VANKA_APPLY", "0") != "1":
            # materialize the dense V = (x)_d V_d from the per-axis factors
            # (jitted broadcast product -- still NO batched eigh): the dense
            # bf16 V matmul measures FASTER on TPU than the factor-form
            # sum-factorized apply (tiny (k+1) contractions lower to
            # transpose-heavy batched matmuls).  Factor-form apply stays
            # available via STFEM_SEP_VANKA_APPLY=1 for memory-bound grids
            # (V is C*A^2 dense vs KBs of factors).
            lam_np, v_axes = sep
            dim = self.dim
            subs = {1: "uap->uap", 2: "uap,vbq->uvabpq",
                    3: "uap,vbq,wcr->uvwabcpqr"}[dim]
            C_ = int(np.prod(cells))
            A = (k + 1) ** dim

            def materialize(vs):
                V = jnp.einsum(subs, *vs)
                return V.reshape(C_, A, A)

            V_full = jax.jit(materialize)(
                [jnp.asarray(v, dtype) for v in v_axes])
            sep = (lam_np, V_full)
        if sep is not None:
            lam_np, v_or_axes = sep
            lam = jnp.asarray(lam_np, dtype)
            if isinstance(v_or_axes, list):
                self.Vsep = [jnp.asarray(v, dtype) for v in v_or_axes]
                self.V = None
            else:
                self.Vsep = None
                self.V = v_or_axes if storage_dtype is None \
                    else v_or_axes.astype(storage_dtype)
            self.Binv = None
            # valence is block-independent: store one (C, A) inverse
            self.dinv = (1.0 / vloc).astype(
                storage_dtype if storage_dtype is not None else dtype)
            if self.n_steps > 1:
                a__ = jnp.asarray(a_nt, dtype)
                b__ = jnp.asarray(b_nt, dtype)
                g__ = jnp.asarray(g_nt, dtype)
                z__ = jnp.asarray(z_nt, dtype)

                def scan_factors(lam_):
                    G = lam_[:, :, None, None] * a__[None, None] \
                        + b__[None, None]
                    Ginv = jnp.linalg.inv(G)
                    gz = lam_[:, :, None] * g__[None, None] + z__[None, None]
                    return Ginv, jnp.einsum("cqij,cqj->cqi", Ginv, gz)

                self.Ginv, self.cvec = jax.jit(scan_factors)(lam)
                self.TTinv = None
            else:
                self.TTinv = jax.jit(lambda lam_: jnp.linalg.inv(
                    lam_[:, :, None, None] * A_[None, None]
                    + B_[None, None]))(lam)
                self.Ginv = None
            return
        # the banded index map is only needed for the dense-patch builds
        flat_idx = np.ascontiguousarray(band_indices(self.cells, self.k))
        if mode == "fastdiag" and self.n_steps > 1:
            self.V, self.Ginv, self.cvec, self.dinv = \
                jax.jit(build_fastdiag_scan)(
                    K_op, M_op, jnp.asarray(flat_idx), vloc,
                    jnp.asarray(a_nt, self.dtype), jnp.asarray(b_nt, self.dtype),
                    jnp.asarray(g_nt, self.dtype), jnp.asarray(z_nt, self.dtype))
            # t-major apply layout (no 13.8 MB transposes in vmult): store
            # the valence scaling as (n_blocks, C, A)
            self.dinv = jnp.transpose(
                self.dinv.reshape(C, n_blocks, A), (1, 0, 2))
            self.TTinv = None
            self.Binv = None
            if storage_dtype is not None:
                # only V (the big factor) is stored reduced; the per-step
                # factors are tiny and precision-critical for the recurrence
                self.V = self.V.astype(storage_dtype)
                self.dinv = self.dinv.astype(storage_dtype)
        elif mode == "fastdiag":
            self.V, self.TTinv, self.dinv = jax.jit(build_fastdiag)(
                K_op, M_op, jnp.asarray(flat_idx), vloc, A_, B_)
            self.Binv = None
            if storage_dtype is not None:
                self.V = self.V.astype(storage_dtype)
                self.TTinv = self.TTinv.astype(storage_dtype)
                self.dinv = self.dinv.astype(storage_dtype)
        else:
            self.Binv = jax.jit(build)(K_op, M_op, jnp.asarray(flat_idx),
                                       vloc, A_, B_)
            if storage_dtype is not None:
                self.Binv = self.Binv.astype(storage_dtype)

    def _sep_mul(self, r: jnp.ndarray, transpose: bool) -> jnp.ndarray:
        """Apply the separable eigenbasis (x)_d V_d (or its transpose) to
        r in natural layout [nb, *cells, *loc] -- dim sum-factorized
        position-batched (k+1)x(k+1) contractions instead of one dense
        A x A basis matmul per cell."""
        dim = self.dim
        cl = "uvw"[:dim]
        al = "abc"[:dim]
        for d in range(dim):
            src = al[:d] + "q" + al[d + 1:]   # axis d carries the input idx
            out = al[:d] + "p" + al[d + 1:]
            # V_d is [cell, dof, eig]; transpose contracts the dof index
            # (w = V^T r), forward contracts the eig index (y = V w)
            vspec = f"{cl[d]}qp" if transpose else f"{cl[d]}pq"
            r = jnp.einsum(f"{vspec},t{cl}{src}->t{cl}{out}",
                           self.Vsep[d], r)
        return r

    def _vmult_grid(self, src: jnp.ndarray) -> jnp.ndarray:
        """Grid apply: per-axis banded matmuls (gather+valence+V fused),
        flat-layout per-position time solve, transposed matmuls scatter."""
        from ..ops.gridsumfac import axis_apply
        from ..ops.pallas_grid import chain_down_order, is_disabled
        nb = src.shape[0]
        w = src.astype(self.dtype)
        use_pallas = self.pallas_grid and not is_disabled()
        bypass = self.pallas_grid and not use_pallas
        if use_pallas:
            from ..ops.pallas_grid import chain_down
            w = chain_down(w, self.Wdn)
        else:
            for d in range(self.dim):
                w = axis_apply(self.Wdn[d], w, 1 + d)
            if bypass:
                # factors were built in the pallas chain order; match it
                dord = chain_down_order(self.dim)
                w = jnp.transpose(w, (0,) + tuple(1 + d for d in dord))
        gshape = w.shape[1:]
        N = int(np.prod(gshape))
        if self.n_steps > 1:
            S, nt = self.n_steps, nb // self.n_steps

            def _solve_xla(wf):
                ws = wf.reshape(S, nt, N)
                # nt x nt solve unrolled into broadcast FMAs (see vmult)
                y = jnp.stack(
                    [sum(self.GinvT[i, j] * ws[:, j] for j in range(nt))
                     for i in range(nt)], axis=1)            # (S, nt, N)
                u = y[:, -1]
                kap = jnp.broadcast_to(self.cvecT[-1], u.shape)

                def comb(first, second):
                    a1, b1 = first
                    a2, b2 = second
                    return a2 * a1, a2 * b1 + b2

                _, last = jax.lax.associative_scan(comb, (kap, u), axis=0)
                a_prev = jnp.concatenate(
                    [jnp.zeros_like(last[:1]), last[:-1]], axis=0)
                y = y + a_prev[:, None] * self.cvecT[None]
                return y.reshape(nb, N).astype(self.dtype)

            wf = w.reshape(nb, N)
            ts_tile = getattr(self, "_ts_tile", None)
            if ts_tile is not None:
                from ..ops.pallas_timesolve import time_solve_pallas

                def _solve_tpu(wf_):
                    return time_solve_pallas(wf_, self.GinvT, self.cvecT,
                                             S, nt, ts_tile, self.dtype)

                w = jax.lax.platform_dependent(wf, tpu=_solve_tpu,
                                               default=_solve_xla)
            else:
                w = _solve_xla(wf)
            w = w.reshape((nb,) + gshape)
        else:
            ws = w.reshape(nb, N)
            if nb <= 8:
                w = jnp.stack(
                    [sum(self.TTg[t, s] * ws[s] for s in range(nb))
                     for t in range(nb)], axis=0)
            else:
                w = jnp.einsum("tsn,sn->tn", self.TTg, ws)
            w = w.reshape((nb,) + gshape)
        # back to the working dtype BEFORE the up matmuls so bf16 levels
        # keep bf16 temporaries (the f32 time-solve factors promote the
        # middle; the cast confines that to the small solve stage)
        w = w.astype(self.dtype)
        if use_pallas:
            from ..ops.pallas_grid import chain_up
            return chain_up(w, self.Wup)
        if bypass:
            dord = chain_down_order(self.dim)
            inv = [0] * self.dim
            for i, d in enumerate(dord):
                inv[d] = i
            w = jnp.transpose(w, (0,) + tuple(1 + inv[d]
                                              for d in range(self.dim)))
        for d in range(self.dim):
            w = axis_apply(self.Wup[d], w, 1 + d)
        return w.astype(self.dtype)

    def vmult(self, src: jnp.ndarray) -> jnp.ndarray:
        """src: [n_blocks, *dofshape] residual -> additive patch updates."""
        if self.Wdn is not None:
            return self._vmult_grid(src)
        src = src.astype(self.dtype)
        nb = src.shape[0]
        r = cell_gather(src, self.cells, self.k)   # [nb, *cells, *loc]
        if self.Binv is not None:
            C = self.Binv.shape[0]
            r = r.reshape(nb, C, -1)
            r = jnp.transpose(r, (1, 0, 2)).reshape(C, -1)   # [C, nb*A]
            y = jnp.einsum("cij,cj->ci", self.Binv, r)
            A = y.shape[1] // nb
            y = y.reshape(C, nb, A).transpose(1, 0, 2)
        elif self.Ginv is not None:
            # block-bidiagonal solve: per-step G^{-1} + O(log S) scalar
            # recurrence for the step-coupling (see class docstring), in
            # T-MAJOR layout (the gathered residual's natural order: no
            # 13.8 MB relayouts).  The nt x nt matvec is UNROLLED into
            # broadcast FMAs: XLA lowers the equivalent einsum
            # ("cqij,csjq->csiq") to a transpose-heavy batched matmul that
            # measures 34x slower on TPU (0.97 ms vs 0.029 ms)
            C = int(np.prod(self.cells))
            A = (self.k + 1) ** self.dim
            S, nt = self.n_steps, nb // self.n_steps
            if self.Vsep is not None:
                rn = r * self.dinv.reshape(
                    self.cells + (self.k + 1,) * self.dim)[None]
                w = self._sep_mul(rn, transpose=True).reshape(nb, C, A)
            else:
                r = r.reshape(nb, C, A) * self.dinv          # D^{-1}
                w = jnp.einsum("caq,tca->tcq", self.V, r)    # V^T r
            w = w.reshape(S, nt, C, A)
            y = jnp.stack(
                [sum(self.Ginv[:, :, i, j] * w[:, j] for j in range(nt))
                 for i in range(nt)], axis=1)                # (S, nt, C, A)
            u = y[:, -1]                                     # (S, C, A)
            kap = jnp.broadcast_to(self.cvec[:, :, -1], u.shape)

            def comb(first, second):
                a1, b1 = first
                a2, b2 = second
                return a2 * a1, a2 * b1 + b2

            _, last = jax.lax.associative_scan(comb, (kap, u), axis=0)
            a_prev = jnp.concatenate(
                [jnp.zeros_like(last[:1]), last[:-1]], axis=0)
            w = y + a_prev[:, None] * jnp.moveaxis(self.cvec, -1, 0)
            w = w.reshape(nb, C, A)
            if self.Vsep is not None:
                y = self._sep_mul(w.reshape(
                    (nb,) + tuple(self.cells)
                    + (self.k + 1,) * self.dim), transpose=False)
                return cell_scatter(y.astype(self.dtype), self.cells, self.k)
            y = jnp.einsum("caq,tcq->tca", self.V, w)        # V back
        elif self.Vsep is not None:
            # single-step separable path, t-major throughout
            C = int(np.prod(self.cells))
            A = (self.k + 1) ** self.dim
            rn = r * self.dinv.reshape(
                self.cells + (self.k + 1,) * self.dim)[None]
            w = self._sep_mul(rn, transpose=True).reshape(nb, C, A)
            if nb <= 8:
                w = jnp.stack(
                    [sum(self.TTinv[:, :, t, s] * w[s] for s in range(nb))
                     for t in range(nb)], axis=0)
            else:
                w = jnp.einsum("cqts,scq->tcq", self.TTinv, w)
            y = self._sep_mul(w.reshape(
                (nb,) + tuple(self.cells) + (self.k + 1,) * self.dim),
                transpose=False)
            return cell_scatter(y.astype(self.dtype), self.cells, self.k)
        else:
            C = self.V.shape[0]
            A = self.V.shape[1]
            r = r.reshape(nb, C, A).transpose(1, 0, 2)       # [C, nb, A]
            # dinv is (C, T*A) from the dense build or (C, A) from the
            # separable build (valence is block-independent)
            dinv = (self.dinv.reshape(C, 1, A) if self.dinv.size == C * A
                    else self.dinv.reshape(C, nb, A))
            r = r * dinv                                     # D^{-1}
            w = jnp.einsum("caq,cta->ctq", self.V, r)        # V^T r
            if nb <= 8:
                # per-eig T x T, unrolled to broadcast FMAs (see above)
                w = jnp.stack(
                    [sum(self.TTinv[:, :, t, s] * w[:, s]
                         for s in range(nb))
                     for t in range(nb)], axis=1)
            else:
                w = jnp.einsum("cqts,csq->ctq", self.TTinv, w)  # per-eig TxT
            y = jnp.einsum("caq,ctq->cta", self.V, w)        # V back
            y = y.transpose(1, 0, 2)
        y = y.reshape((nb,) + tuple(self.cells) + (self.k + 1,) * self.dim)
        return cell_scatter(y.astype(self.dtype), self.cells, self.k)
