"""Bond-Angle-Torsion (BAT) internal coordinates.

Re-implementation of the reference's BAT machinery
(example/bat_mda.py:42-264): a mass-ordered spanning-tree z-matrix over the
bond graph, external coordinates of the root triple (origin + polar/
azimuthal/spin angles + two bond lengths and an angle), and phase-shifted
torsions (each torsion is stored relative to the first "primary" torsion
sharing its central bond, so genetic crossover moves whole rotatable-bond
dihedrals coherently).

Layout of a BAT vector for n_torsions = natom - 3:
  [0:3]   root atom origin (first torsion's a3)
  [3:6]   phi, theta, omega — root orientation
  [6:9]   r01, r12, a012 — root internal geometry
  [9:9+n]              bond lengths r(a0, a1)
  [9+n:9+2n]           angles (a0, a1, a2)
  [9+2n:9+3n]          phase-shifted torsions (a0, a1, a2, a3)

Conversions are pure NumPy (host-side; the chain reconstruction is
inherently sequential and tiny — 47 atoms — while energies of the
resulting poses are evaluated in batch on device).
"""

from __future__ import annotations

import numpy as np

__all__ = ["build_zmatrix", "xyz_to_bat", "bat_to_xyz",
           "make_jax_converters"]


def _sorted_by_mass(pairs, reverse=False):
    return sorted(pairs, key=lambda a: (a[1], a[0]), reverse=reverse)


def build_zmatrix(masses, bonds):
    """Spanning-tree z-matrix.

    Args:
      masses: [N] atomic masses.
      bonds: iterable of (i, j) bonded atom pairs.

    Returns:
      (torsions [N-3, 4] int array of (a0, a1, a2, a3) with a0 the new atom,
       primary_torsion_indices [N-3] list: for each torsion, the index of
       the first torsion sharing its central (a1, a2) bond).
    """
    natom = len(masses)
    adj = {i: [] for i in range(natom)}
    for i, j in bonds:
        adj[int(i)].append(int(j))
        adj[int(j)].append(int(i))

    terminal = _sorted_by_mass([(i, masses[i]) for i in adj
                                if len(adj[i]) == 1], reverse=True)
    if not terminal:
        raise ValueError("molecule has no terminal atoms (ring-only graph "
                         "unsupported)")
    initial = terminal[0][0]
    second = adj[initial][0]
    candidates = [(k, masses[k]) for k in adj[second]
                  if (k, masses[k]) not in terminal]
    candidates.sort(key=lambda a: a[1], reverse=True)
    if not candidates:
        raise ValueError("root selection failed: second atom has only "
                         "terminal neighbors")
    third = candidates[0][0]

    root = [initial, second, third]
    selected = list(root)
    torsions = []
    while len(selected) < natom:
        added = False
        for a1 in list(selected):
            for a0, _ in _sorted_by_mass(
                    [(a0, masses[a0]) for a0 in adj[a1]
                     if a0 not in selected]):
                a2_list = _sorted_by_mass(
                    [(a2, masses[a2]) for a2 in adj[a1]
                     if a2 != a0 and len(adj[a2]) > 1 and a2 in selected])
                for a2, _ in a2_list:
                    a3_list = _sorted_by_mass(
                        [(a3, masses[a3]) for a3 in adj[a2]
                         if a3 != a1 and a3 in selected])
                    for a3, _ in a3_list:
                        torsions.append([a0, a1, a2, a3])
                        selected.append(a0)
                        added = True
                        break
                    break
        if not added:
            raise ValueError("spanning tree construction stalled "
                             f"({len(selected)}/{natom} atoms)")

    torsions = np.asarray(torsions)
    central = [tuple(sorted((t[1], t[2]))) for t in torsions]
    primary = [central.index(c) for c in central]
    return torsions, primary


def _distance(p1, p2):
    return float(np.linalg.norm(p2 - p1))


def _angle(p1, p2, p3):
    v1 = p2 - p1
    v2 = p2 - p3
    c = np.dot(v1, v2) / np.sqrt(np.dot(v1, v1) * np.dot(v2, v2))
    return float(np.arccos(np.clip(c, -1.0, 1.0)))


def _dihedral(p1, p2, p3, p4):
    b1 = p2 - p1
    b2 = p3 - p2
    b3 = p4 - p3
    c1 = np.cross(b2, b3)
    c2 = np.cross(b1, b2)
    y = np.dot(b1, c1) * np.linalg.norm(b2)
    x = np.dot(c1, c2)
    return float(np.arctan2(y, x))


def xyz_to_bat(xyz, torsions, primary):
    """Cartesian [N, 3] -> BAT vector."""
    xyz = np.asarray(xyz, dtype=np.float64)
    a0, a1, a2, a3 = torsions[0]
    p0, p1, p2 = xyz[a3], xyz[a2], xyz[a1]

    v01 = p1 - p0
    v21 = p1 - p2
    r01 = np.linalg.norm(v01)
    r12 = np.linalg.norm(v21)
    a012 = np.arccos(np.clip(np.dot(v01, v21) / (r01 * r12), -1.0, 1.0))

    e = v01 / r01
    phi = np.arctan2(e[1], e[0])
    theta = np.arccos(np.clip(e[2], -1.0, 1.0))
    cp, sp = np.cos(phi), np.sin(phi)
    ct, st = np.cos(theta), np.sin(theta)
    Rz = np.array([[cp * ct, ct * sp, -st],
                   [-sp, cp, 0.0],
                   [cp * st, sp * st, ct]])
    pos2 = Rz @ (p2 - p1)
    omega = np.arctan2(pos2[1], pos2[0])
    root = np.concatenate([p0, [phi, theta, omega, r01, r12, a012]])

    bonds, angles, tors = [], [], []
    for (b0, b1, b2, b3) in torsions:
        bonds.append(_distance(xyz[b0], xyz[b1]))
        angles.append(_angle(xyz[b0], xyz[b1], xyz[b2]))
        tors.append(_dihedral(xyz[b0], xyz[b1], xyz[b2], xyz[b3]))
    tors = np.asarray(tors)

    shift = tors[primary].copy()
    shift[sorted(set(primary))] = 0.0
    tors = ((tors - shift + np.pi) % (2.0 * np.pi)) - np.pi
    return np.concatenate([root, bonds, angles, tors])


def bat_to_xyz(bat_vec, torsions, primary):
    """BAT vector -> Cartesian [N, 3]."""
    bat_vec = np.asarray(bat_vec, dtype=np.float64)
    n = len(torsions)
    origin = bat_vec[:3]
    phi, theta, omega = bat_vec[3:6]
    r01, r12, a012 = bat_vec[6:9]
    bonds = bat_vec[9:9 + n]
    angles = bat_vec[9 + n:9 + 2 * n]
    tors = bat_vec[9 + 2 * n:].copy()

    shift = tors[primary].copy()
    shift[sorted(set(primary))] = 0.0
    tors = ((tors + shift + np.pi) % (2.0 * np.pi)) - np.pi

    p0 = np.zeros(3)
    p1 = np.array([0.0, 0.0, r01])
    p2 = np.array([r12 * np.sin(a012), 0.0, r01 - r12 * np.cos(a012)])
    co, so = np.cos(omega), np.sin(omega)
    Romega = np.array([[co, -so, 0.0], [so, co, 0.0], [0.0, 0.0, 1.0]])
    p2 = Romega @ p2
    cp, sp = np.cos(phi), np.sin(phi)
    ct, st = np.cos(theta), np.sin(theta)
    Re = np.array([[cp * ct, -sp, cp * st],
                   [ct * sp, cp, sp * st],
                   [-st, 0.0, ct]])
    p1 = Re @ p1
    p2 = Re @ p2
    p0 = p0 + origin
    p1 = p1 + origin
    p2 = p2 + origin

    xyz = np.zeros((n + 3, 3))
    a0, a1, a2, a3 = torsions[0]
    xyz[a3], xyz[a2], xyz[a1] = p0, p1, p2

    for (b0, b1, b2, b3), r, ang, tor in zip(torsions, bonds, angles, tors):
        q1, q2, q3 = xyz[b1], xyz[b2], xyz[b3]
        sn_ang, cs_ang = np.sin(ang), np.cos(ang)
        sn_tor, cs_tor = np.sin(tor), np.cos(tor)

        v21 = q1 - q2
        v21 /= np.linalg.norm(v21)
        v32 = q2 - q3
        v32 /= np.linalg.norm(v32)
        vp = np.cross(v32, v21)
        cs = np.dot(v21, v32)
        sn = np.sqrt(max(1.0 - cs * cs, 1e-10))
        vp = vp / sn
        vu = np.cross(vp, v21)
        xyz[b0] = q1 + r * (vu * sn_ang * cs_tor + vp * sn_ang * sn_tor
                            - v21 * cs_ang)
    return xyz


def make_jax_converters(torsions, primary):
    """jnp ports of :func:`xyz_to_bat` / :func:`bat_to_xyz` for ONE
    z-matrix, vmappable over conformations — the device path for
    genetic-MC proposal batches (all 2*n_pairs BAT round-trips + splices
    run inside one jitted dispatch instead of host-serial NumPy).

    ``xyz_to_bat`` is fully vectorized over torsion rows; ``bat_to_xyz``
    reconstructs the chain with a ``lax.scan`` over the (dependency-
    ordered) z-matrix — sequential per conformation, but a vmapped batch
    reconstructs all conformations in lockstep, which is the TPU-shaped
    layout (batch on the vector lanes, 44-step chain in the scan).
    Returns ``(xyz_to_bat_fn, bat_to_xyz_fn)``; parity vs the NumPy path
    is ~1e-12 in float64 (tests/test_sampling.py)."""
    import jax
    import jax.numpy as jnp

    t = np.asarray(torsions, dtype=np.int32)
    primary = np.asarray(primary, dtype=np.int32)
    n = len(t)
    prim_mask = np.zeros(n, dtype=bool)
    prim_mask[sorted(set(primary.tolist()))] = True
    a0r, a1r, a2r, a3r = (int(v) for v in t[0])
    two_pi = 2.0 * np.pi

    def xyz_to_bat_fn(xyz):
        xyz = jnp.asarray(xyz)
        p0, p1, p2 = xyz[a3r], xyz[a2r], xyz[a1r]
        v01 = p1 - p0
        v21 = p1 - p2
        r01 = jnp.linalg.norm(v01)
        r12 = jnp.linalg.norm(v21)
        a012 = jnp.arccos(jnp.clip(jnp.dot(v01, v21) / (r01 * r12),
                                   -1.0, 1.0))
        e = v01 / r01
        phi = jnp.arctan2(e[1], e[0])
        theta = jnp.arccos(jnp.clip(e[2], -1.0, 1.0))
        cp, sp = jnp.cos(phi), jnp.sin(phi)
        ct, st = jnp.cos(theta), jnp.sin(theta)
        rz = jnp.stack([jnp.stack([cp * ct, ct * sp, -st]),
                        jnp.stack([-sp, cp, jnp.zeros_like(sp)]),
                        jnp.stack([cp * st, sp * st, ct])])
        pos2 = rz @ (p2 - p1)
        omega = jnp.arctan2(pos2[1], pos2[0])
        root = jnp.concatenate(
            [p0, jnp.stack([phi, theta, omega, r01, r12, a012])])

        q0, q1, q2, q3 = (xyz[t[:, 0]], xyz[t[:, 1]], xyz[t[:, 2]],
                          xyz[t[:, 3]])
        bonds = jnp.linalg.norm(q0 - q1, axis=1)
        w1, w2 = q1 - q0, q1 - q2
        angles = jnp.arccos(jnp.clip(
            jnp.sum(w1 * w2, axis=1)
            / jnp.sqrt(jnp.sum(w1 * w1, axis=1)
                       * jnp.sum(w2 * w2, axis=1)), -1.0, 1.0))
        b1, b2, b3 = q1 - q0, q2 - q1, q3 - q2
        c1 = jnp.cross(b2, b3)
        c2 = jnp.cross(b1, b2)
        y = jnp.sum(b1 * c1, axis=1) * jnp.linalg.norm(b2, axis=1)
        x = jnp.sum(c1 * c2, axis=1)
        tors = jnp.arctan2(y, x)
        shift = jnp.where(jnp.asarray(prim_mask), 0.0, tors[primary])
        tors = jnp.mod(tors - shift + np.pi, two_pi) - np.pi
        return jnp.concatenate([root, bonds, angles, tors])

    def bat_to_xyz_fn(bv):
        bv = jnp.asarray(bv)
        dtype = bv.dtype
        origin = bv[:3]
        phi, theta, omega = bv[3], bv[4], bv[5]
        r01, r12, a012 = bv[6], bv[7], bv[8]
        bonds = bv[9:9 + n]
        angles = bv[9 + n:9 + 2 * n]
        tors0 = bv[9 + 2 * n:]
        shift = jnp.where(jnp.asarray(prim_mask), 0.0, tors0[primary])
        tors = jnp.mod(tors0 + shift + np.pi, two_pi) - np.pi

        p1 = jnp.stack([jnp.zeros_like(r01), jnp.zeros_like(r01), r01])
        p2 = jnp.stack([r12 * jnp.sin(a012), jnp.zeros_like(r12),
                        r01 - r12 * jnp.cos(a012)])
        co, so = jnp.cos(omega), jnp.sin(omega)
        z, o = jnp.zeros_like(co), jnp.ones_like(co)
        romega = jnp.stack([jnp.stack([co, -so, z]),
                            jnp.stack([so, co, z]),
                            jnp.stack([z, z, o])])
        p2 = romega @ p2
        cp, sp = jnp.cos(phi), jnp.sin(phi)
        ct, st = jnp.cos(theta), jnp.sin(theta)
        re = jnp.stack([jnp.stack([cp * ct, -sp, cp * st]),
                        jnp.stack([ct * sp, cp, sp * st]),
                        jnp.stack([-st, z, ct])])
        p1 = re @ p1 + origin
        p2 = re @ p2 + origin

        xyz0 = jnp.zeros((n + 3, 3), dtype)
        xyz0 = xyz0.at[a3r].set(origin).at[a2r].set(p1).at[a1r].set(p2)

        def body(xyz, inp):
            idx, r, ang, tor = inp
            q1, q2, q3 = xyz[idx[1]], xyz[idx[2]], xyz[idx[3]]
            v21 = q1 - q2
            v21 = v21 / jnp.linalg.norm(v21)
            v32 = q2 - q3
            v32 = v32 / jnp.linalg.norm(v32)
            vp = jnp.cross(v32, v21)
            cs = jnp.dot(v21, v32)
            sn = jnp.sqrt(jnp.maximum(1.0 - cs * cs, 1e-10))
            vp = vp / sn
            vu = jnp.cross(vp, v21)
            new = q1 + r * (vu * jnp.sin(ang) * jnp.cos(tor)
                            + vp * jnp.sin(ang) * jnp.sin(tor)
                            - v21 * jnp.cos(ang))
            return xyz.at[idx[0]].set(new), None

        xyz, _ = jax.lax.scan(body, xyz0,
                              (jnp.asarray(t), bonds, angles, tors))
        return xyz

    return xyz_to_bat_fn, bat_to_xyz_fn
