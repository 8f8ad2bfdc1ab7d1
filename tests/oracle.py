"""Independent NumPy oracle path tracer.

A from-scratch, vectorized-NumPy implementation of the reference's Path A
semantics (rayColor, main.cu:63-94) with its own RNG. Used to cross-validate
the JAX integrator statistically (converged means, not per-sample equality —
the RNG-parity strategy of SURVEY.md §4/§7). Deliberately written in a
different style from the production code so mistakes don't correlate.

Supports: lambertian / metal / dielectric / emission materials, spheres
(static + moving) and finite oriented planes, thin-lens camera, sky gradient.
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
        self.materials = {}

    def material(self, mid, kind, albedo=(0, 0, 0), param=0.0):
        self.materials[mid] = (kind, np.asarray(albedo, F), F(param))

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
    for mid, (kind, alb, par) in scene.materials.items():
        sel = mat_id == mid
        kinds[sel] = kind
        albedo[sel] = alb
        param[sel] = par

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

    return new_dir, atten, scattered, emitted


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
            nd, at, sc, em = _scatter(rng, scene, d, normal, front, mat)
            term = alive & hit_valid & ~sc
            radiance[term] += throughput[term] * em[term]
            cont = alive & hit_valid & sc
            throughput[cont] *= at[cont]
            o = np.where(cont[:, None], o + np.where(hit_valid, t, 0)[:, None] * d, o)
            d = np.where(cont[:, None], nd, d)
            alive = cont
            if not alive.any():
                break
        accum += radiance
    return (accum / spp).reshape(height, width, 3)
