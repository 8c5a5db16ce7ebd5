"""Spatial domain decomposition with halo exchange — the TPU-native
scale-out path the reference has no equivalent of (SURVEY.md §2.3: the
reference is single-GPU; its closest analog is the intra-device cell-pair
machinery, cuCellList.cu).

The simulation box is split into x-slabs of the cell grid, one per
device along the mesh's ``x`` axis.  Each device:

1. bins the atoms that fall inside its slab into the (cap, ncx_loc,
   ncy, ncz) SoA block structure (atoms outside the slab drop out of the
   local scatter);
2. exchanges one boundary x-plane of blocks with each slab neighbor over
   ICI via `lax.ppermute` (the halo), applying the periodic box shift on
   the wrap-around links;
3. runs the roll-based cell-block pair pass on the extended slab
   (x-offsets index the halo planes; y/z offsets are rolls);
4. scatters its local per-slot forces back to atom order and `psum`s
   across devices (each atom is owned by exactly one slab).

Positions/types are replicated (pure spatial decomposition of the
*work* and the cell structure); energies are `psum`-reduced scalars.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..io.control import ELEC_NONE
from ..ops.pairs import MX_FRC
from ..ops.vdw import vdw_eval
from ..ops.elec import coul_eval


def pair_forces_domain(cfg, ff, pos, types, mesh: Mesh,
                       axis: str = "x"):
    """Domain-decomposed pair forces: returns (frc (N,3), eng_vdw,
    eng_coul).  Requires cfg.grid.dims[0] divisible by the mesh size and
    a 27-point stencil (cell edge >= cutoff, dims >= 3)."""
    ndev = mesh.devices.size
    grid = cfg.grid
    ncx, ncy, ncz = grid.dims
    cap = grid.cap
    if ncx % ndev:
        raise ValueError(f"ncx={ncx} not divisible by {ndev} devices")
    if min(grid.dims) < 3 or any(abs(o) > 1 for off in grid.stencil
                                 for o in off):
        raise ValueError("domain decomposition needs a 27-point stencil")
    nloc = ncx // ndev
    N = cfg.n_at
    nsp = cfg.n_spec
    dt = pos.dtype

    def local_pass(pos, types):
        dev = jax.lax.axis_index(axis)
        x0 = dev * nloc

        # --- bin into the local slab (cap, nloc, ncy, ncz) ---
        scale = jnp.asarray([grid.dims[k] / cfg.box[k] for k in range(3)],
                            dt)
        c = jnp.floor(pos * scale).astype(jnp.int32) \
            % jnp.asarray(grid.dims, jnp.int32)
        local = (c[:, 0] >= x0) & (c[:, 0] < x0 + nloc)
        cid = ((c[:, 0] - x0) * ncy + c[:, 1]) * ncz + c[:, 2]
        cid = jnp.where(local, cid, nloc * ncy * ncz)
        order = jnp.argsort(cid)
        scid = cid[order]
        first = jnp.searchsorted(scid, scid, side="left")
        rank = jnp.arange(N, dtype=jnp.int32) - first.astype(jnp.int32)
        n_cell_loc = nloc * ncy * ncz
        slot = jnp.where((rank < cap) & (scid < n_cell_loc),
                         rank * n_cell_loc + scid, cap * n_cell_loc)

        def blk(vals, fill):
            out = jnp.full((cap * n_cell_loc,), fill, vals.dtype)
            return out.at[slot].set(vals[order], mode="drop") \
                .reshape(cap, nloc, ncy, ncz)

        bx = blk(pos[:, 0], jnp.asarray(0.0, dt))
        by = blk(pos[:, 1], jnp.asarray(0.0, dt))
        bz = blk(pos[:, 2], jnp.asarray(0.0, dt))
        bv = blk(jnp.ones((N,), dt), jnp.asarray(0.0, dt))
        bt = blk(types, jnp.asarray(0, jnp.int32))

        # --- halo exchange of boundary planes over ICI ---
        right = [(i, (i + 1) % ndev) for i in range(ndev)]
        left = [(i, (i - 1) % ndev) for i in range(ndev)]
        box_x = jnp.asarray(cfg.box[0], dt)

        def halo(b, is_x):
            # receive the neighbor's edge planes; ppermute sends this
            # device's plane along each link
            from_left = jax.lax.ppermute(b[:, -1:], axis, right)
            from_right = jax.lax.ppermute(b[:, :1], axis, left)
            if is_x:
                # wrap-around links carry a periodic image shift
                from_left = jnp.where(dev == 0, from_left - box_x,
                                      from_left)
                from_right = jnp.where(dev == ndev - 1,
                                       from_right + box_x, from_right)
            return jnp.concatenate([from_left, b, from_right], axis=1)

        ex = halo(bx, True)
        ey = halo(by, False)
        ez = halo(bz, False)
        ev_ = halo(bv, False)
        et = halo(bt, False)

        # --- pair pass over the extended slab ---
        xi = bx.reshape(cap, -1)
        yi = by.reshape(cap, -1)
        zi = bz.reshape(cap, -1)
        vi = bv.reshape(cap, -1)
        ti = bt.reshape(cap, -1)

        fx = jnp.zeros_like(xi)
        fy = jnp.zeros_like(xi)
        fz = jnp.zeros_like(xi)
        e_vdw = jnp.zeros((), dt)
        e_coul = jnp.zeros((), dt)
        box = jnp.asarray(cfg.box, dt)

        for off in grid.stencil:
            dx_, dy_, dz_ = off

            def nb(e):
                # x: slice the extended slab; y/z: periodic rolls
                a = e[:, 1 + dx_: 1 + dx_ + nloc]
                if dy_:
                    a = jnp.roll(a, -dy_, axis=2)
                if dz_:
                    a = jnp.roll(a, -dz_, axis=3)
                return a.reshape(cap, -1)

            xj, yj, zj = nb(ex), nb(ey), nb(ez)
            vj, tj = nb(ev_), nb(et)

            ddx = xi[:, None, :] - xj[None, :, :]
            ddy = yi[:, None, :] - yj[None, :, :]
            ddz = zi[:, None, :] - zj[None, :, :]
            # y/z wrap via minimum image (x handled by the halo shift)
            ddy = ddy - box[1] * jnp.round(ddy / box[1])
            ddz = ddz - box[2] * jnp.round(ddz / box[2])
            r2 = ddx * ddx + ddy * ddy + ddz * ddz

            mask = (vi[:, None, :] * vj[None, :, :]) > 0.0
            mask = mask & (r2 <= cfg.r2_max)
            if off == (0, 0, 0):
                eye = jnp.eye(cap, dtype=bool)
                mask = mask & ~eye[:, :, None]

            r2s = jnp.where(mask, r2, 1.0)
            rr = jnp.sqrt(r2s)
            tpair = ti[:, None, :] * nsp + tj[None, :, :]

            if cfg.elec_type != ELEC_NONE:
                chp = ff.chprod.reshape(-1)[tpair]
                fc, ecl = coul_eval(cfg, r2s, rr, chp)
                fc = jnp.where(mask, fc, 0.0)
                ecl = jnp.where(mask, ecl, 0.0)
            else:
                fc = ecl = jnp.zeros_like(r2s)

            if cfg.vdw_families:
                kind = ff.vdw_kind.reshape(-1)[tpair]
                vp = ff.vdw_p.reshape(-1, 5)[tpair]
                r2cut = ff.vdw_r2cut.reshape(-1)[tpair]
                vmask = mask & (r2 <= r2cut)
                kind = jnp.where(vmask, kind, 0)
                fv, evd = vdw_eval(kind, vp, r2s, rr,
                                   families=cfg.vdw_families)
                fv = jnp.where(vmask, fv, 0.0)
                evd = jnp.where(vmask, evd, 0.0)
            else:
                fv = evd = jnp.zeros_like(r2s)

            f = jnp.clip(fc + fv, -MX_FRC, MX_FRC)
            fx = fx + jnp.sum(f * ddx, axis=1)
            fy = fy + jnp.sum(f * ddy, axis=1)
            fz = fz + jnp.sum(f * ddz, axis=1)
            e_vdw = e_vdw + 0.5 * jnp.sum(evd)
            e_coul = e_coul + 0.5 * jnp.sum(ecl)

        # --- back to atom order: each device owns its slab's atoms ---
        soa = jnp.full((N,), cap * n_cell_loc, jnp.int32)
        soa = soa.at[order].set(slot)

        def unsort(a):
            flat = jnp.concatenate([a.reshape(-1),
                                    jnp.zeros((1,), a.dtype)])
            return flat[jnp.minimum(soa, cap * n_cell_loc)]

        frc = jnp.stack([unsort(fx), unsort(fy), unsort(fz)], axis=1)
        frc = jax.lax.psum(frc, axis)
        e_vdw = jax.lax.psum(e_vdw, axis)
        e_coul = jax.lax.psum(e_coul, axis)
        return frc, e_vdw, e_coul

    fn = shard_map(local_pass, mesh=mesh,
                   in_specs=(P(), P()),
                   out_specs=(P(), P(), P()))
    return fn(pos, types)
