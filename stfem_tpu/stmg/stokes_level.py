"""Stokes-specific STMG level components: block Vanka over (u,p) cell
patches and flat-layout transfers.

Reference: the block PreconditionVanka (stmg.h:649-743) with
M_mask = velocity-only, and MGTwoLevelBlockTransfer/MGTwoLevelTransferTime
applied per variable (stmg.h:38-247); here everything acts on the flat
[T, n_u + n_p] Stokes vectors.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..blocks import BlockSlice
from ..mesh.fe_dgp import dgp_child_embedding, dgp_p_embedding
from ..ops.spatial import LaplaceMassOperator, cell_gather, cell_scatter
from ..ops.stokes import StokesOperator
from ..utils.module import register_module
from .transfers import SpaceTransfer, TimeTransfer
from .vanka import _band_flat, dof_valence


def _assemble_patch_up(E_up, cells, n_comp, ku, kp):
    """Neighbor-overlap assembly of the rectangular u-p coupling for
    CONTINUOUS (FE_Q) pressure: the ASSEMBLED entry A[gu, gp] sums element
    contributions from every cell containing both dofs, so the per-cell
    patch is the element tensor plus slice-adds from all 3^dim - 1 neighbor
    shifts (the banded-assembly analogue of the reference's ghost-row
    extraction, compute_block_matrix.h:50-139, for the rectangular block)."""
    import itertools
    dim = len(cells)
    A_u = (ku + 1) ** dim
    A_p = (kp + 1) ** dim
    C = int(np.prod(cells))
    E = E_up.reshape(cells + (n_comp,) + (ku + 1,) * dim + (kp + 1,) * dim)
    P = E
    for delta in itertools.product((-1, 0, 1), repeat=dim):
        if all(d == 0 for d in delta):
            continue
        dst_c, src_c, dst_u, src_u, dst_p, src_p = [], [], [], [], [], []
        for d, dd in enumerate(delta):
            if dd == 0:
                for lst in (dst_c, src_c, dst_u, src_u, dst_p, src_p):
                    lst.append(slice(None))
            elif dd == 1:
                dst_c.append(slice(0, cells[d] - 1))
                src_c.append(slice(1, None))
                dst_u.append(slice(ku, ku + 1))
                src_u.append(slice(0, 1))
                dst_p.append(slice(kp, kp + 1))
                src_p.append(slice(0, 1))
            else:
                dst_c.append(slice(1, None))
                src_c.append(slice(0, cells[d] - 1))
                dst_u.append(slice(0, 1))
                src_u.append(slice(ku, ku + 1))
                dst_p.append(slice(0, 1))
                src_p.append(slice(kp, kp + 1))
        src = E[tuple(src_c) + (slice(None),) + tuple(src_u) + tuple(src_p)]
        P = P.at[tuple(dst_c) + (slice(None),)
                 + tuple(dst_u) + tuple(dst_p)].add(src)
    return P.reshape(C, n_comp * A_u, A_p)


@register_module
class StokesVanka:
    """Cell-patch Vanka for the space-time Stokes slab.

    Patch rows ordered by block index (variable-major BlockSlice: timestep,
    [u,p], timedof) with per-block spatial dofs = all cell u-dofs
    (component-major) or all cell p-modes.  B = Alpha_st (x) K_blocks +
    Beta_st (x) M_uu, valence-row-scaled, inverted batched at setup.
    """

    def __init__(self, stokes_op: StokesOperator,
                 mass_op: LaplaceMassOperator, Alpha_st, Beta_st,
                 blk: BlockSlice, dtype=None, use_scan: bool = True):
        S = stokes_op
        self.S = S
        self.blk = blk
        self.dtype = dtype or S.dtype
        dim, k = S.dim, S.u_degree
        cells = S.cells
        C = int(np.prod(cells))
        A_s = (k + 1) ** dim
        A_u = dim * A_s
        n_pl = S.n_ploc_cell
        n_blocks = blk.n_blocks
        Alpha_st = np.asarray(Alpha_st)
        Beta_st = np.asarray(Beta_st)

        # assembled uu (scalar, nu included) and mass patches; masks follow
        # the Stokes operator (weak Nitsche faces stay free)
        lap = LaplaceMassOperator(S.mesh, k, S.n_q, 0.0, S.viscosity,
                                  dtype=self.dtype, mask=S.mask_u_np)
        mass = LaplaceMassOperator(S.mesh, k, S.n_q, 1.0, 0.0,
                                   dtype=self.dtype, mask=S.mask_u_np)
        from ..utils.native import band_indices
        flat_idx = jnp.asarray(band_indices(cells, k))

        # Nitsche face contributions per component / coupling, scattered onto
        # the boundary-layer cells
        face_uu = None
        face_up = None
        face_pu = None
        if S.weak_faces:
            face_uu = [jnp.zeros((C, A_s, A_s), self.dtype)
                       for _ in range(dim)]
            face_up = jnp.zeros((C, dim * A_s, n_pl), self.dtype)
            face_pu = jnp.zeros((C, n_pl, dim * A_s), self.dtype)
            cell_grid = np.arange(C).reshape(cells)
            for (d0, side, Fuu, Fup, Fpu) in S.face_element_matrices():
                sl = [slice(None)] * dim
                sl[d0] = 0 if side == 0 else -1
                layer = cell_grid[tuple(sl)].reshape(-1)
                for c in range(dim):
                    face_uu[c] = face_uu[c].at[layer].add(Fuu[c])
                face_up = face_up.at[layer].add(Fup)
                face_pu = face_pu.at[layer].add(Fpu)

        # weak-obstacle Nitsche terms.  The component-DIAGONAL u-u parts go
        # through the banded assembly (extra_E per cell, like the boundary
        # faces) so that every patch sharing an obstacle dof sees consistent
        # rows; only the cross-component gamma2 n_c n_e parts (curved
        # normals) and the u-p coupling are cell-local bolt-ons.
        obs_uu = obs_up = obs_pu = None
        if getattr(S, "weak_obstacle", False):
            ob = S._obstacle_face_setup()
            if ob is not None:
                E_uu_f = np.asarray(ob["E_uu"])        # (F, dim, dim, A, A)
                E_up_f = np.asarray(ob["E_up"])        # (F, dim, A, m)
                pidx = np.asarray(ob["pidx"])
                F = E_uu_f.shape[0]
                if face_uu is None:
                    face_uu = [jnp.zeros((C, A_s, A_s), self.dtype)
                               for _ in range(dim)]
                for c in range(dim):
                    face_uu[c] = face_uu[c].at[pidx].add(
                        jnp.asarray(E_uu_f[:, c, c], self.dtype))
                E_off = E_uu_f.copy()
                for c in range(dim):
                    E_off[:, c, c] = 0.0
                obs_uu = jnp.zeros((C, A_u, A_u), self.dtype)
                obs_up = jnp.zeros((C, A_u, n_pl), self.dtype)
                uu_cm = jnp.asarray(
                    E_off.transpose(0, 1, 3, 2, 4).reshape(F, A_u, A_u),
                    self.dtype)
                up_cm = jnp.asarray(E_up_f.reshape(F, A_u, n_pl), self.dtype)
                obs_uu = obs_uu.at[pidx].add(uu_cm)
                obs_up = obs_up.at[pidx].add(up_cm)
                obs_pu = -jnp.swapaxes(obs_up, 1, 2)

        sizes = []
        for i in range(n_blocks):
            _, iv, _ = blk.decompose(i)
            sizes.append(A_u if iv == 0 else n_pl)
        offs = np.concatenate([[0], np.cumsum(sizes)])
        P = int(offs[-1])
        self._sizes = sizes
        self._offs = offs
        dtype = self.dtype
        val_u = dof_valence(cells, k)
        vloc_np = val_u

        # ---- multi-step scan factorization (round 3, the heat fastdiag
        # time trick ported to Stokes): block indices are timestep-major,
        # so when the slab tables are block-bidiagonal with IDENTICAL
        # per-step diagonal blocks and a one-step coupling (verified
        # numerically below -- true for the DG/CGP multi-step assembly,
        # fe_time.h:381-402), the patch solve factorizes into per-STEP
        # inverses B1inv [C, P1, P1] plus a sequential recurrence
        # y_s = B1inv r_s - Kappa y_{s-1}, Kappa = B1inv (D Bcoup).
        # Storage and setup drop from (S P1)^2 to ~2 P1^2 per cell (S^2 x),
        # which is what makes ntao >= 8 Stokes slabs buildable at all.
        self.n_steps = 1
        nb_step = blk.n_variables * blk.n_timedofs
        n_steps = blk.n_timesteps_at_once
        A_np = Alpha_st
        B_np = Beta_st
        if use_scan and n_steps > 1 and n_blocks == n_steps * nb_step:
            s0 = slice(0, nb_step)
            s1 = slice(nb_step, 2 * nb_step)
            A0s, B0s = A_np[s0, s0], B_np[s0, s0]
            Acs, Bcs = A_np[s1, s0], B_np[s1, s0]
            ok = True
            for s in range(n_steps):
                ss = slice(s * nb_step, (s + 1) * nb_step)
                ok &= np.array_equal(A_np[ss, ss], A0s)
                ok &= np.array_equal(B_np[ss, ss], B0s)
                if s:
                    sp = slice((s - 1) * nb_step, s * nb_step)
                    ok &= np.array_equal(A_np[ss, sp], Acs)
                    ok &= np.array_equal(B_np[ss, sp], Bcs)
                for t in range(n_steps):
                    if abs(s - t) > 1 or t > s:
                        tt = slice(t * nb_step, (t + 1) * nb_step)
                        ok &= not (np.any(A_np[ss, tt])
                                   or np.any(B_np[ss, tt]))
                if not ok:
                    break
            if ok:
                self.n_steps = n_steps

        # one jitted program for the whole build (see vanka.py note)
        def build(lap_, mass_, S_, fidx, vloc, face_uu_, face_up_, face_pu_,
                  obs_uu_, obs_up_, obs_pu_):
            Kuu_c = []
            for c in range(dim):
                extra = None if face_uu_ is None else face_uu_[c]
                Kuu_c.append(_band_flat(lap_, fidx, extra)[fidx]
                             .astype(dtype))
            Muu_s = _band_flat(mass_, fidx)[fidx]
            _, E_up, E_pu = S_.element_matrices()
            E_up = E_up.astype(dtype)
            E_pu = E_pu.astype(dtype)
            if face_up_ is not None:
                E_up = E_up + face_up_
                E_pu = E_pu + face_pu_
            if obs_up_ is not None:
                E_up = E_up + obs_up_
                E_pu = E_pu + obs_pu_
            if not S_.dg_pressure:
                # continuous pressure: patch coupling is the assembled sum
                # over neighbor cells
                E_up = _assemble_patch_up(E_up, cells, dim, k, S_.p_degree)
                E_pu = -jnp.swapaxes(E_up, 1, 2)

            def blockdiag_list(comps):
                Z = jnp.zeros((C, A_s, A_s), dtype)
                rows = []
                for c in range(dim):
                    cols = [comps[c] if c == e else Z for e in range(dim)]
                    rows.append(jnp.concatenate(cols, axis=2))
                return jnp.concatenate(rows, axis=1)

            Kuu = blockdiag_list(Kuu_c)
            if obs_uu_ is not None:
                Kuu = Kuu + obs_uu_
            Muu = blockdiag_list([Muu_s.astype(dtype)] * dim)

            def assemble(A_tab, B_tab, nb_rows, nb_cols):
                """B_sub [C, P_r, P_c] over the (identically laid out)
                row/col block lists; tables indexed locally."""
                Pr, Pc = int(offs[nb_rows]), int(offs[nb_cols])
                Bm = jnp.zeros((C, Pr, Pc), dtype)
                for i in range(nb_rows):
                    _, iv, _ = blk.decompose(i)
                    for j in range(nb_cols):
                        _, jv, _ = blk.decompose(j)
                        a = float(A_tab[i, j])
                        b = float(B_tab[i, j])
                        if a == 0.0 and b == 0.0:
                            continue
                        if iv == 0 and jv == 0:
                            sub = a * Kuu + b * Muu
                        elif iv == 0 and jv == 1:
                            sub = a * E_up
                        elif iv == 1 and jv == 0:
                            sub = a * E_pu
                        else:
                            continue  # p-p: no coupling
                        r0, r1 = int(offs[i]), int(offs[i + 1])
                        c0, c1 = int(offs[j]), int(offs[j + 1])
                        Bm = Bm.at[:, r0:r1, c0:c1].add(sub)
                return Bm

            # valence row scaling (u rows: spatial multiplicity; p rows:
            # 1 for cell-local DGP modes, dof multiplicity for FE_Q nodes)
            vl = cell_gather(vloc, cells, k).reshape(C, A_s)
            if S_.dg_pressure:
                vl_p = jnp.ones((C, n_pl), dtype)
            else:
                valp = jnp.asarray(dof_valence(cells, S_.p_degree), dtype)
                vl_p = cell_gather(valp, cells, S_.p_degree).reshape(C, n_pl)

            def vrows_for(nb_rows):
                vrows = []
                for i in range(nb_rows):
                    _, iv, _ = blk.decompose(i)
                    if iv == 0:
                        vrows.append(jnp.concatenate([vl] * dim, axis=1))
                    else:
                        vrows.append(vl_p)
                return jnp.concatenate(vrows, axis=1)

            def invert(B):
                # regularize fully-decoupled rows (degenerate coarse lvls)
                zero_rows = (jnp.max(jnp.abs(B), axis=2) == 0.0).astype(
                    dtype)
                B = B + jax.vmap(jnp.diag)(zero_rows)
                if S_.dg_pressure:
                    return jnp.linalg.inv(B)
                # FE_Q: continuous-pressure patches can be SINGULAR (few
                # free velocity dofs vs the cell's nodal pressure dofs on
                # very coarse levels); the pseudo-inverse drops those
                # directions instead of blowing up -- additive updates from
                # neighboring patches and coarser levels cover them
                return jnp.linalg.pinv(B, rtol=1e-6)

            if self.n_steps > 1:
                vr1 = vrows_for(nb_step)[:, :, None]
                B1 = assemble(A0s, B0s, nb_step, nb_step) * vr1
                Bc = assemble(Acs, Bcs, nb_step, nb_step) * vr1
                B1inv = invert(B1)
                Kappa = jnp.einsum("cij,cjk->cik", B1inv, Bc)
                # rows regularized to identity in B1 (fully decoupled in the
                # diagonal block) must not retain step coupling through Bc --
                # match the dense path, which regularizes from the full slab
                # matrix (degenerate coarse-level edge case)
                zrows = (jnp.max(jnp.abs(B1), axis=2) == 0.0)
                Kappa = jnp.where(zrows[:, :, None], 0.0, Kappa)
                return B1inv, Kappa
            B = assemble(Alpha_st, Beta_st, n_blocks, n_blocks)
            B = B * vrows_for(n_blocks)[:, :, None]
            return invert(B), None

        self.Binv, self.Kappa = jax.jit(build)(
            lap, mass, S, flat_idx, jnp.asarray(vloc_np, dtype),
            face_uu, face_up, face_pu, obs_uu, obs_up, obs_pu)
        if getattr(S, "weak_obstacle", False) and S.mesh.cell_mask is not None:
            # removed-cell patches must not update the (now free)
            # obstacle-boundary dofs: their rows are degenerate (zero
            # volume) and the regularized inverses inject noise
            act = jnp.asarray(S.mesh.cell_mask.reshape(-1), dtype)
            self.Binv = self.Binv * act[:, None, None]
            if self.Kappa is not None:
                self.Kappa = self.Kappa * act[:, None, None]

    def vmult(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: flat [T, n_u + n_p] residual."""
        S = self.S
        blk = self.blk
        dim, k = S.dim, S.u_degree
        cells = S.cells
        C = self.Binv.shape[0]
        A_s = (k + 1) ** dim
        x = x.astype(self.dtype)
        u, p = S.unpack(x)  # u: [T, dim, *grid], p: [T, *cells, nploc]
        T = u.shape[0]
        nt = blk.n_timedofs

        # gather per (block, cell): build [C, P] residual in patch order
        uc = cell_gather(u, cells, k)           # [T, dim, *cells, *loc]
        uc = jnp.moveaxis(uc.reshape(T, dim, C, A_s), 2, 0)  # [C, T, dim, A_s]
        uc = uc.reshape(C, T, dim * A_s)
        n_pl = S.n_ploc_cell
        if S.dg_pressure:
            pc = p.reshape(T, C, n_pl).transpose(1, 0, 2)    # [C, T, nploc]
        else:
            pc = cell_gather(p, cells, S.p_degree)
            pc = pc.reshape(T, C, n_pl).transpose(1, 0, 2)
        segs = []
        for i in range(blk.n_blocks):
            it, iv, idof = blk.decompose(i)
            tpos = it * nt + idof
            segs.append(uc[:, tpos] if iv == 0 else pc[:, tpos])
        r = jnp.concatenate(segs, axis=1)       # [C, P]
        if self.n_steps > 1:
            # per-step solve + sequential one-step recurrence (see build):
            # y_s = B1inv r_s - Kappa y_{s-1}
            S_steps = self.n_steps
            P1 = r.shape[1] // S_steps
            rs = r.reshape(C, S_steps, P1)
            y0 = jnp.einsum("cij,csj->csi", self.Binv, rs)

            def body(y_prev, y0s):
                y_s = y0s - jnp.einsum("cij,cj->ci", self.Kappa, y_prev)
                return y_s, y_s
            _, ys = jax.lax.scan(body, jnp.zeros_like(y0[:, 0]),
                                 jnp.moveaxis(y0, 1, 0))
            y = jnp.moveaxis(ys, 0, 1).reshape(C, r.shape[1])
        else:
            y = jnp.einsum("cij,cj->ci", self.Binv, r)

        # scatter back
        du = jnp.zeros((T, dim, C, A_s), self.dtype)
        dp = jnp.zeros((T, C, n_pl), self.dtype)
        for i in range(blk.n_blocks):
            it, iv, idof = blk.decompose(i)
            tpos = it * nt + idof
            r0, r1 = int(self._offs[i]), int(self._offs[i + 1])
            seg = y[:, r0:r1]
            if iv == 0:
                du = du.at[tpos].add(
                    seg.reshape(C, dim, A_s).transpose(1, 0, 2))
            else:
                dp = dp.at[tpos].add(seg)
        du = du.reshape(T, dim, *cells, *((k + 1,) * dim))
        du = cell_scatter(du, cells, k)
        if S.dg_pressure:
            dp = dp.transpose(1, 0, 2).reshape(cells + (T, n_pl))
            # reorder dp axes back to [T, *cells, nploc]
            dp = jnp.moveaxis(dp, -2, 0)
        else:
            kp = S.p_degree
            dp = dp.reshape(T, *cells, *((kp + 1,) * dim))
            dp = cell_scatter(dp, cells, kp)
        return S.pack(du, dp)


@register_module
class StokesSpaceTransfer:
    """h- or p-transfer acting on the flat Stokes layout: separable 1D
    transfer on each velocity component + exact DGP embedding for pressure."""

    def __init__(self, S_fine: StokesOperator, S_coarse: StokesOperator,
                 u_transfer: SpaceTransfer, mg_type: str, dtype,
                 p_transfer: SpaceTransfer | None = None):
        self.Sf = S_fine
        self.Sc = S_coarse
        self.u_transfer = u_transfer
        self.p_transfer = p_transfer       # FE_Q (nodal) pressure transfer
        self.mg_type = mg_type  # 'h' or 'p'
        dim = S_fine.dim
        if not S_fine.dg_pressure:
            assert p_transfer is not None, \
                "FE_Q pressure levels need a nodal pressure SpaceTransfer"
        elif mg_type == "h":
            assert S_fine.p_degree == S_coarse.p_degree
            self.Ech = jnp.asarray(
                dgp_child_embedding(dim, S_fine.p_degree), dtype)
        else:
            self.Pp = jnp.asarray(
                dgp_p_embedding(dim, S_coarse.p_degree, S_fine.p_degree),
                dtype)

    def _p_prolongate(self, pc):
        dim = self.Sf.dim
        if self.p_transfer is not None:
            return self.p_transfer.prolongate(pc)
        if self.mg_type == "p":
            return jnp.einsum("fm,...m->...f", self.Pp, pc)
        # h: coarse cells split into 2^dim children
        ccells = self.Sc.cells
        T = pc.shape[0]
        m = pc.shape[-1]
        out = jnp.zeros((T,) + self.Sf.cells + (m,), pc.dtype)
        import itertools
        for ci, bits in enumerate(itertools.product((0, 1), repeat=dim)):
            vals = jnp.einsum("fm,...m->...f", self.Ech[ci], pc)
            idx = tuple(slice(b, None, 2) for b in bits)
            out = out.at[(slice(None),) + idx].set(vals)
        return out

    def _p_restrict(self, pf):
        dim = self.Sf.dim
        if self.p_transfer is not None:
            return self.p_transfer.restrict(pf)
        if self.mg_type == "p":
            return jnp.einsum("fm,...f->...m", self.Pp, pf)
        import itertools
        T = pf.shape[0]
        m = pf.shape[-1]
        out = jnp.zeros((T,) + self.Sc.cells + (m,), pf.dtype)
        for ci, bits in enumerate(itertools.product((0, 1), repeat=dim)):
            idx = tuple(slice(b, None, 2) for b in bits)
            out = out + jnp.einsum("fm,...f->...m", self.Ech[ci],
                                   pf[(slice(None),) + idx])
        return out

    def prolongate(self, xc: jnp.ndarray) -> jnp.ndarray:
        uc, pc = self.Sc.unpack(xc)
        uf = self.u_transfer.prolongate(uc)
        pf = self._p_prolongate(pc)
        return self.Sf.pack(uf, pf)

    def restrict(self, xf: jnp.ndarray) -> jnp.ndarray:
        uf, pf = self.Sf.unpack(xf)
        uc = self.u_transfer.restrict(uf)
        pc = self._p_restrict(pf)
        return self.Sc.pack(uc, pc)


@register_module
class StokesTimeTransfer:
    """tau/k time transfer on the flat layout: one dense matrix over the
    time-position axis applied to the whole flat vector."""

    def __init__(self, time_transfer: TimeTransfer):
        self.tt = time_transfer

    def prolongate(self, xc):
        return self.tt.prolongate(xc)

    def restrict(self, xf):
        return self.tt.restrict(xf)
