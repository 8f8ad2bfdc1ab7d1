"""Independent NumPy oracle path tracer.

A from-scratch, vectorized-NumPy implementation of the reference's Path A
semantics (rayColor, main.cu:63-94) with its own RNG. Used to cross-validate
the JAX integrator statistically (converged means, not per-sample equality —
the RNG-parity strategy of SURVEY.md §4/§7). Deliberately written in a
different style from the production code so mistakes don't correlate.

Supports: lambertian / metal / dielectric / emission materials plus the
Path B kinds (phong-metal / specular / coat / refraction, additive per-hit
emission — pathTrace semantics, CUDAPathTracer.cu:430,455-614), spheres
(static + moving), finite oriented planes and brute-force triangles
(Möller–Trumbore with backface cull, TriangleMesh.cu:57-80), thin-lens
camera, sky gradient.
"""

from __future__ import annotations

import numpy as np

F = np.float32


def _normalize(v):
    n = np.linalg.norm(v, axis=-1, keepdims=True)
    return v / np.where(n > 0, n, 1)


def _dot(a, b):
    return np.sum(a * b, axis=-1)


class OracleScene:
    def __init__(self):
        self.spheres = []   # (c0, c1, t0, t1, radius, mat)
        self.planes = []    # (pos, normal, extend, orientation, two_sided, mat)
        self.triangles = []  # (v0, v1, v2, mat) — brute, backface-culled
        self.materials = {}

    def material(self, mid, kind, albedo=(0, 0, 0), param=0.0,
                 emission=(0, 0, 0)):
        self.materials[mid] = (
            kind, np.asarray(albedo, F), F(param), np.asarray(emission, F)
        )

    def triangle(self, v0, v1, v2, mid):
        self.triangles.append(
            (np.asarray(v0, F), np.asarray(v1, F), np.asarray(v2, F), mid)
        )

    def mesh(self, vertices, mid):
        """vertices: (T, 3, 3)."""
        for tri in np.asarray(vertices, F):
            self.triangle(tri[0], tri[1], tri[2], mid)

    def sphere(self, c, r, mid):
        self.spheres.append((np.asarray(c, F), np.asarray(c, F), 0.0, 1.0, F(r), mid))

    def moving_sphere(self, c0, c1, t0, t1, r, mid):
        self.spheres.append((np.asarray(c0, F), np.asarray(c1, F), t0, t1, F(r), mid))

    def plane(self, pos, normal, extend, orientation, mid, two_sided=True):
        self.planes.append(
            (np.asarray(pos, F), np.asarray(normal, F), np.asarray(extend, F), orientation, two_sided, mid)
        )


def _hit_scene(scene, origin, direction, time, tmin):
    n = origin.shape[0]
    best_t = np.full(n, np.inf, F)
    best_normal = np.zeros((n, 3), F)
    best_front = np.zeros(n, bool)
    best_mat = np.full(n, -1, np.int64)

    def consider(t, valid, outward, mid):
        nonlocal best_t, best_normal, best_front, best_mat
        closer = valid & (t < best_t)
        front = _dot(direction, outward) < 1.1920929e-07
        normal = np.where(front[:, None], outward, -outward)
        best_t = np.where(closer, t, best_t)
        best_normal = np.where(closer[:, None], normal, best_normal)
        best_front = np.where(closer, front, best_front)
        best_mat = np.where(closer, mid, best_mat)

    for c0, c1, t0, t1, radius, mid in scene.spheres:
        w = ((time - t0) / (t1 - t0))[:, None]
        center = c0 + w * (c1 - c0)
        oc = origin - center
        a = _dot(direction, direction)
        half_b = _dot(oc, direction)
        c = _dot(oc, oc) - radius * radius
        disc = half_b * half_b - a * c
        ok = disc > 1.1920929e-07
        sq = np.sqrt(np.where(ok, disc, 0))
        r0 = (-half_b - sq) / a
        r1 = (-half_b + sq) / a
        in0 = (r0 >= tmin) & np.isfinite(r0)
        t = np.where(in0, r0, r1)
        valid = ok & (t >= tmin)
        p = origin + t[:, None] * direction
        outward = (p - center) / radius
        consider(t.astype(F), valid, outward.astype(F), mid)

    for pos, normal, extend, orientation, two_sided, mid in scene.planes:
        denom = _dot(direction, normal[None, :])
        proceed = np.abs(denom) > 1e-3 if two_sided else denom > 1e-3
        t = _dot(pos[None, :] - origin, normal[None, :]) / np.where(proceed, denom, 1)
        p = origin + t[:, None] * direction
        lo, hi = pos - extend, pos + extend
        inside = (p > lo) & (p < hi)
        axes = {0: (0, 1), 1: (1, 2), 2: (0, 2)}[orientation]
        in_range = inside[:, axes[0]] & inside[:, axes[1]]
        valid = proceed & in_range & (t >= tmin)
        outward = np.tile(normal, (n, 1))
        consider(t.astype(F), valid, outward, mid)

    for v0, v1, v2, mid in scene.triangles:
        # Möller–Trumbore with backface cull (TriangleMesh.cu:57-80).
        e1 = v1 - v0
        e2 = v2 - v0
        pvec = np.cross(direction, e2[None, :])
        det = _dot(pvec, e1[None, :])
        ok = det > 1.1920929e-07  # backface cull: det <= eps rejected
        inv = 1.0 / np.where(ok, det, 1.0)
        tvec = origin - v0
        u = _dot(tvec, pvec) * inv
        qvec = np.cross(tvec, e1[None, :])
        v = _dot(direction, qvec) * inv
        t = _dot(e2[None, :], qvec) * inv
        valid = ok & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1) & (t >= tmin)
        outward = np.tile(_normalize(np.cross(e1, e2)), (n, 1))
        consider(t.astype(F), valid, outward, mid)

    return best_t, best_normal, best_front, best_mat


def _scatter(rng, scene, direction, normal, front, mat_id):
    n = direction.shape[0]
    new_dir = np.zeros((n, 3), F)
    atten = np.zeros((n, 3), F)
    scattered = np.zeros(n, bool)
    emitted = np.zeros((n, 3), F)

    kinds = np.full(n, -1)
    albedo = np.zeros((n, 3), F)
    param = np.zeros(n, F)
    emis_add = np.zeros((n, 3), F)
    for mid, (kind, alb, par, emi) in scene.materials.items():
        sel = mat_id == mid
        kinds[sel] = kind
        albedo[sel] = alb
        param[sel] = par
        emis_add[sel] = emi

    unit = _normalize(direction)

    # Lambertian: normal + uniform unit vector.
    u = rng.normal(size=(n, 3))
    sph = _normalize(u)
    lamb = normal + sph
    tiny = np.all(np.abs(lamb) < 1e-8, axis=-1)
    lamb[tiny] = normal[tiny]
    sel = kinds == 0
    new_dir[sel] = _normalize(lamb)[sel]
    atten[sel] = albedo[sel]
    scattered[sel] = True

    # Metal: mirror + fuzz * in-unit-sphere.
    mirror = unit - 2 * _dot(unit, normal)[:, None] * normal
    ball = _normalize(rng.normal(size=(n, 3))) * np.cbrt(rng.random(n))[:, None]
    met = mirror + param[:, None] * ball
    ok = _dot(met, normal) > 0
    sel = kinds == 1
    new_dir[sel] = _normalize(np.where(ok[:, None], met, mirror))[sel]
    atten[sel] = (albedo * ok[:, None])[sel]
    scattered[sel] = ok[sel]

    # Dielectric. (param may be 0 for non-dielectric rows; guard the divide.)
    p_safe = np.where(param > 0, param, 1.0)
    eta = np.where(front, 1.0 / p_safe, p_safe)
    cos_t = np.minimum(_dot(-unit, normal), 1.0)
    sin_t = np.sqrt(np.maximum(0, 1 - cos_t**2))
    cannot = eta * sin_t > 1.0
    r0 = ((1 - eta) / (1 + eta)) ** 2
    refl_p = r0 + (1 - r0) * (1 - cos_t) ** 5
    take_reflect = cannot | (refl_p > rng.random(n))
    perp = eta[:, None] * (unit + cos_t[:, None] * normal)
    k = np.maximum(0, 1 - _dot(perp, perp))
    refr = perp - np.sqrt(k)[:, None] * normal
    diel = np.where(take_reflect[:, None], mirror, refr)
    sel = kinds == 2
    new_dir[sel] = _normalize(diel)[sel]
    atten[sel] = 1.0
    scattered[sel] = True

    # Emission.
    sel = kinds == 3
    emitted[sel] = (albedo * param[:, None])[sel]
    scattered[sel] = False

    def lobe(axis, cos_theta):
        """cos_theta-polar lobe about unit `axis`, independent azimuth."""
        a = np.where(np.abs(axis[:, 0:1]) > 0.9, [[0.0, 1.0, 0.0]],
                     [[1.0, 0.0, 0.0]])
        t = _normalize(np.cross(a, axis))
        b = np.cross(axis, t)
        phi = 2 * np.pi * rng.random(n)
        sin_theta = np.sqrt(np.maximum(0, 1 - cos_theta**2))
        return (
            t * (np.cos(phi) * sin_theta)[:, None]
            + b * (np.sin(phi) * sin_theta)[:, None]
            + axis * cos_theta[:, None]
        )

    # Phong metal (Path B METAL, CUDAPathTracer.cu:479-504).
    sel = kinds == 4
    if sel.any():
        cs = np.power(np.maximum(rng.random(n), 1e-12), 1.0 / (param + 1.0))
        pd = lobe(_normalize(mirror), cs.astype(F))
        new_dir[sel] = pd[sel]
        atten[sel] = albedo[sel]
        scattered[sel] = True

    # Specular (Path B, CUDAPathTracer.cu:507-517).
    sel = kinds == 5
    new_dir[sel] = _normalize(mirror)[sel]
    atten[sel] = albedo[sel]
    scattered[sel] = True

    # Coat (Path B, CUDAPathTracer.cu:522-563): 5% white specular else
    # cosine-lobe diffuse.
    sel = kinds == 6
    if sel.any():
        spec = rng.random(n) < 0.05
        cd = lobe(normal, np.sqrt(np.maximum(0, 1 - rng.random(n))).astype(F))
        new_dir[sel] = np.where(spec[:, None], mirror, cd)[sel]
        atten[sel] = np.where(spec[:, None], 1.0, albedo)[sel]
        scattered[sel] = True

    # Refraction (Path B, CUDAPathTracer.cu:566-614) with the two
    # documented divergences (R0 precedence, branch prob = P) matching
    # ops/materials.py:193-212.
    sel = kinds == 7
    if sel.any():
        nt = np.where(param > 0, param, 1.5)
        nnt = np.where(front, 1.0 / nt, nt)
        ddn = _dot(unit, normal)
        cos2t = 1.0 - nnt * nnt * (1.0 - ddn * ddn)
        tir = cos2t < 0
        perp = nnt[:, None] * (unit - ddn[:, None] * normal) + (
            -np.sqrt(np.maximum(0, cos2t))
        )[:, None] * normal
        tdir = _normalize(perp)
        r0 = ((nt - 1.0) / (nt + 1.0)) ** 2
        c1m = 1.0 - np.where(front, -ddn, _dot(tdir, normal))
        re = r0 + (1.0 - r0) * c1m**5
        prob = 0.25 + 0.5 * re
        choose = tir | (rng.random(n) < prob)
        w = np.where(tir, 1.0, np.where(choose, re / prob, (1 - re) / (1 - prob)))
        new_dir[sel] = np.where(choose[:, None], _normalize(mirror), tdir)[sel]
        atten[sel] = (albedo * w[:, None])[sel]
        scattered[sel] = True

    return new_dir, atten, scattered, emitted, emis_add


def render_oracle(scene, eye, center, up, fov, width, height, spp, bounces,
                  aperture=0.0, focus_distance=None, seed=7, tmin=1e-3,
                  time_range=(0.0, 1.0)):
    """Render with the oracle; returns the mean radiance image (H, W, 3),
    y=0 at the bottom (film convention)."""
    rng = np.random.default_rng(seed)
    eye = np.asarray(eye, F)
    center = np.asarray(center, F)
    up = np.asarray(up, F)
    if focus_distance is None:
        focus_distance = np.linalg.norm(center - eye)

    scale = np.tan(np.deg2rad(fov / 2))
    vh = 2 * scale
    vw = vh * (width / height)
    forward = _normalize(center - eye)
    right = _normalize(np.cross(forward, up))
    true_up = np.cross(right, forward)
    horizontal = vw * right * focus_distance
    vertical = vh * true_up * focus_distance
    lower_left = eye - horizontal / 2 - vertical / 2 + forward * focus_distance
    lens_r = aperture / 2

    npix = width * height
    xs = np.tile(np.arange(width), height).astype(F)
    ys = np.repeat(np.arange(height), width).astype(F)

    accum = np.zeros((npix, 3), F)
    for _ in range(spp):
        jx, jy = rng.random(npix), rng.random(npix)
        dx = (xs + jx) / (width - 1)
        dy = (ys + jy) / (height - 1)
        r = np.sqrt(rng.random(npix))
        phi = 2 * np.pi * rng.random(npix)
        disk = lens_r * np.stack([r * np.cos(phi), r * np.sin(phi)], axis=1)
        origin = eye + disk[:, :1] * right + disk[:, 1:2] * true_up
        direction = _normalize(
            lower_left + dx[:, None] * horizontal + dy[:, None] * vertical - origin
        ).astype(F)
        time = rng.uniform(*time_range, npix).astype(F)

        throughput = np.ones((npix, 3), F)
        radiance = np.zeros((npix, 3), F)
        alive = np.ones(npix, bool)
        o, d = origin.astype(F).copy(), direction.copy()
        for _b in range(bounces):
            t, normal, front, mat = _hit_scene(scene, o, d, time, tmin)
            hit_valid = np.isfinite(t)
            unit = _normalize(d)
            sky = (1 - 0.5 * (unit[:, 1] + 1))[:, None] * np.ones(3, F) + (
                0.5 * (unit[:, 1] + 1)
            )[:, None] * np.asarray([0.5, 0.7, 1.0], F)
            miss = alive & ~hit_valid
            radiance[miss] += throughput[miss] * sky[miss]
            nd, at, sc, em, emadd = _scatter(rng, scene, d, normal, front, mat)
            term = alive & hit_valid & ~sc
            radiance[term] += throughput[term] * em[term]
            # Path B additive emission on every hit (CUDAPathTracer.cu:430).
            hot = alive & hit_valid
            radiance[hot] += throughput[hot] * emadd[hot]
            cont = alive & hit_valid & sc
            throughput[cont] *= at[cont]
            o = np.where(cont[:, None], o + np.where(hit_valid, t, 0)[:, None] * d, o)
            d = np.where(cont[:, None], nd, d)
            alive = cont
            if not alive.any():
                break
        accum += radiance
    return (accum / spp).reshape(height, width, 3)
