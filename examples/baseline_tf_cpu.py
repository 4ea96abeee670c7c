"""Reference-equivalent TF-CPU baseline for the performance sweep.

Implements the reference's trace algorithm faithfully -- TF2 eager, float64,
dense N x M meshgrid intersection + inf-fill + argmin + gather, 2-bounce
Python loop (tfrt geometry.py:27-167, engine.py:687-749, optimizer-free) --
to establish the wall-clock baseline the TPU rebuild is compared against
(BASELINE.md measurement task 2: "Time ... on TF-CPU reference vs the new
framework on TPU").  The reference itself cannot run here (it needs pyvista
and tfquaternion), so this is its hot loop re-created at spec.

Run:  python examples/baseline_tf_cpu.py          # 2D sweep
      python examples/baseline_tf_cpu.py --3d     # + the depth-3 lens
                                                  # training step (measured
                                                  # TF-CPU baseline for the
                                                  # simple_3d_optimize scale)
"""

import math
import time

import numpy as np


def main():
    import tensorflow as tf

    tf.config.set_visible_devices([], "GPU")
    PI = math.pi

    def raw_line_intersect(x1s, y1s, x1e, y1e, x2s, y2s, x2e, y2e, eps):
        # tfrt geometry.py:96-167, verbatim algorithm
        x1 = x1e - x1s
        y1 = y1e - y1s
        x2 = x2e - x2s
        y2 = y2e - y2s
        denominator = x1 * y2 - y1 * x2
        valid = tf.greater_equal(tf.abs(denominator), eps)
        safe_value = tf.ones_like(denominator)
        safe_denominator = 1.0 / tf.where(valid, denominator, safe_value)
        u = tf.where(valid, (x2 * (y1s - y2s) - y2 * (x1s - x2s)) * safe_denominator,
                     safe_value)
        v = tf.where(valid, (y1 * (x2s - x1s) - x1 * (y2s - y1s)) * safe_denominator,
                     safe_value)
        x = x1s + u * x1
        y = y1s + u * y1
        return x, y, valid, u, v

    def segment_intersection(rx1, ry1, rx2, ry2, sx1, sy1, sx2, sy2):
        # tfrt engine.py:687-749: meshgrid + prune + inf-fill + argmin + gather
        rx1m, sx1m = tf.meshgrid(rx1, sx1)
        ry1m, sy1m = tf.meshgrid(ry1, sy1)
        rx2m, sx2m = tf.meshgrid(rx2, sx2)
        ry2m, sy2m = tf.meshgrid(ry2, sy2)
        x, y, valid, ray_u, seg_u = raw_line_intersect(
            rx1m, ry1m, rx2m, ry2m, sx1m, sy1m, sx2m, sy2m, 1e-10)
        valid = tf.logical_and(valid, tf.greater_equal(seg_u, -1e-10))
        valid = tf.logical_and(valid, tf.less_equal(seg_u, 1 + 1e-10))
        valid = tf.logical_and(valid, tf.greater_equal(ray_u, 1e-10))
        inf = 2 * tf.reduce_max(ray_u) * tf.ones_like(ray_u)
        ray_u = tf.where(valid, ray_u, inf)
        closest = tf.argmin(ray_u, axis=0)
        valid = tf.reduce_any(valid, axis=0)
        rng = tf.range(tf.shape(rx1)[0], dtype=tf.int64)
        gather = tf.transpose(tf.stack([closest, rng]))
        return (tf.gather_nd(x, gather), tf.gather_nd(y, gather), valid, closest)

    def snell_2d(xs, ys, xe, ye, norm, n_in, n_out):
        # tfrt geometry.py:565-653 (abridged to the refract path semantics)
        norm = tf.math.mod(norm, 2 * PI)
        ray_angle = tf.math.mod(tf.atan2(ys - ye, xs - xe), 2 * PI)
        theta1 = norm - ray_angle
        theta1 = tf.where(theta1 > PI, theta1 - 2 * PI, theta1)
        theta1 = tf.where(theta1 < -PI, theta1 + 2 * PI, theta1)
        internal = tf.abs(theta1) >= PI / 2
        one = tf.ones_like(theta1)
        n = tf.where(internal, n_in / n_out, n_out / n_in)
        norm = tf.where(internal, norm, norm + PI)
        theta1 = tf.where(internal, theta1 + PI, theta1)
        theta2 = n * tf.sin(theta1)
        refracts = tf.abs(theta2) <= 1.0
        new_angle = tf.where(refracts, norm - tf.asin(tf.clip_by_value(theta2, -1., 1.)),
                             norm + theta1 + PI)
        return xe, ye, xe + tf.cos(new_angle), ye + tf.sin(new_angle)

    print("TF-CPU float64 eager, dense N x M (reference algorithm)")
    for n_rays_req, n_segs in ((10, 11), (10000, 11), (10, 1001), (10000, 1001)):
        n_rays = (n_rays_req // 6) * 6 or 6
        ys0 = np.linspace(-1.5, 1.5, n_rays)
        rx1 = tf.constant(np.full(n_rays, -1.0))
        ry1 = tf.constant(ys0)
        rx2 = tf.constant(np.zeros(n_rays))
        ry2 = tf.constant(ys0)
        pts = np.linspace(-2, 2, n_segs + 1)
        sx1 = tf.constant(np.full(n_segs, 0.1))
        sy1 = tf.constant(pts[:-1])
        sx2 = tf.constant(np.full(n_segs, 0.1))
        sy2 = tf.constant(pts[1:])
        norm = tf.atan2(sy2 - sy1, sx2 - sx1) + PI / 2
        tx1 = tf.constant(np.asarray([10.0]))
        ty1 = tf.constant(np.asarray([-5.0]))
        tx2 = tf.constant(np.asarray([10.0]))
        ty2 = tf.constant(np.asarray([5.0]))

        def one_trace():
            # bounce 1: rays vs optical segments
            x, y, valid, idx = segment_intersection(
                rx1, ry1, rx2, ry2, sx1, sy1, sx2, sy2)
            # project + react
            xs2, ys2, xe2, ye2 = snell_2d(
                rx1, ry1, x, y, tf.gather(norm, idx),
                tf.fill(tf.shape(x), np.float64(1.49)),
                tf.ones_like(x))
            # bounce 2: children vs the target
            x2, y2, v2, _ = segment_intersection(
                xs2, ys2, xe2, ye2, tx1, ty1, tx2, ty2)
            return x2, y2

        one_trace()  # warmup
        reps = 20 if n_rays * n_segs < 10_000_000 else 5
        t0 = time.time()
        for _ in range(reps):
            out = one_trace()
        _ = np.asarray(out[0])
        dt = (time.time() - t0) / reps
        inter = n_rays * (n_segs + 1) * 2
        print(f"  {n_rays:>8} rays x {n_segs:>5} segments: "
              f"{dt * 1e3:9.2f} ms/trace  ({inter / dt / 1e9:7.3f} G int/s)")


def lens_step_3d(steps=3):
    """The reference's depth-3 lens TRAINING step, measured (not extrapolated):
    dense meshgrid triangle intersection (tfrt engine.py:1102-1166), Snell 3D
    (geometry.py:671-753), boolean_mask compaction per pass, imaging loss, and
    tf.GradientTape backward to two per-vertex parameter variables --
    2025 rays x 3074 scene triangles, the simple_3d_optimize workload
    (dev/simple_3d_optimize.py:30-31,119-138)."""
    import tensorflow as tf

    from tensorflowraytrace_tpu.models import mesh as mt

    tf.config.set_visible_devices([], "GPU")
    PI = math.pi
    rng = np.random.default_rng(0)

    # scene: two parametric hexagonal-mesh surfaces + a big target plane
    zm = mt.hexagonal_mesh(1.2, 16)                      # 817 V, 1536 F
    pts = zm.points[:, [2, 0, 1]]                        # x forward
    faces = np.asarray(zm.faces, dtype=np.int64)
    zero1 = tf.constant(pts)
    zero2 = tf.constant(pts + np.array([0.2, 0.0, 0.0]))
    vec = tf.constant(np.array([1.0, 0.0, 0.0]))
    p1_var = tf.Variable(tf.zeros([pts.shape[0], 1], tf.float64))
    p2_var = tf.Variable(tf.zeros([pts.shape[0], 1], tf.float64))
    half, td = 50.0, 8.0
    tgt_vp = tf.constant(np.array([[td, -half, -half], [td, half, half]]))
    tgt_v1 = tf.constant(np.array([[td, half, -half], [td, -half, half]]))
    tgt_v2 = tf.constant(np.array([[td, half, half], [td, -half, -half]]))
    n_tri = 2 * faces.shape[0] + 2
    category = tf.constant(np.concatenate(
        [np.zeros(2 * faces.shape[0]), np.full(2, 2.0)]))  # optical / target

    # source: 2025 random rays in a cone from a square (dev scale)
    n_rays = 2025
    base = rng.uniform(-0.1, 0.1, size=(n_rays, 2))
    theta = np.arccos(rng.uniform(np.cos(PI / 16), 1.0, n_rays))
    phi = rng.uniform(0, 2 * PI, n_rays)
    d = np.stack([np.cos(theta), np.sin(theta) * np.cos(phi),
                  np.sin(theta) * np.sin(phi)], axis=1)
    p0_np = np.concatenate([np.full((n_rays, 1), -4.0), base], axis=1)
    rank_np = base / 0.1
    r_p0 = tf.constant(p0_np)
    r_p1 = tf.constant(p0_np + d)
    rank0 = tf.constant(rank_np)
    n_in_tbl = tf.constant(np.concatenate(
        [np.full(2 * faces.shape[0], 1.49), np.ones(2)]))
    n_out_tbl = tf.ones([n_tri], tf.float64)

    def tri_intersect_dense(p0, p1, vp, v1, v2):
        # tfrt geometry.py:275-320 Cramer algebra, meshgridded (M, N)
        rs = lambda a: a[None, :]
        ss = lambda a: a[:, None]
        a_ = rs(p0[:, 0] - p1[:, 0]); d_ = rs(p0[:, 1] - p1[:, 1]); h_ = rs(p0[:, 2] - p1[:, 2])
        b_ = ss(v1[:, 0] - vp[:, 0]); f_ = ss(v1[:, 1] - vp[:, 1]); k_ = ss(v1[:, 2] - vp[:, 2])
        c_ = ss(v2[:, 0] - vp[:, 0]); g_ = ss(v2[:, 1] - vp[:, 1]); l_ = ss(v2[:, 2] - vp[:, 2])
        q_ = rs(p0[:, 0]) - ss(vp[:, 0]); r_ = rs(p0[:, 1]) - ss(vp[:, 1]); s_ = rs(p0[:, 2]) - ss(vp[:, 2])
        den = a_*g_*k_ + b_*d_*l_ + c_*f_*h_ - a_*f_*l_ - b_*g_*h_ - c_*d_*k_
        ray_u_num = b_*l_*r_ + c_*f_*s_ + g_*k_*q_ - b_*g_*s_ - c_*k_*r_ - f_*l_*q_
        tu_num = a_*g_*s_ + c_*h_*r_ + d_*l_*q_ - a_*l_*r_ - c_*d_*s_ - g_*h_*q_
        tv_num = a_*k_*r_ + b_*d_*s_ + f_*h_*q_ - a_*f_*s_ - b_*h_*r_ - d_*k_*q_
        valid = tf.abs(den) >= 1e-10
        inv = 1.0 / tf.where(valid, den, tf.ones_like(den))
        ray_u = ray_u_num * inv
        tu = tu_num * inv
        tv = tv_num * inv
        valid = valid & (tu >= -1e-10) & (tv >= -1e-10) & (tu + tv <= 1 + 1e-10)
        valid = valid & (ray_u >= 1e-10)
        return valid, ray_u, tu, tv

    def snell3d(p0, p1, n, n_in, n_out):
        u = p1 - p0
        u = u / tf.norm(u, axis=1, keepdims=True)
        n = n / tf.norm(n, axis=1, keepdims=True)
        nu = tf.reduce_sum(n * u, axis=1, keepdims=True)
        internal = nu > 0
        eta = tf.where(internal[:, 0], n_in / n_out, n_out / n_in)[:, None]
        nu_eta = eta * nu
        radicand = 1 - eta * eta + nu_eta * nu_eta
        tir = radicand < 0
        safe = tf.where(tir, tf.ones_like(radicand), radicand)
        refr = (tf.sign(nu) * tf.sqrt(safe) - nu_eta) * n + eta * u
        refl = -2 * nu * n + u
        dvec = tf.where(tir, refl, refr)
        return p1, p1 + dvec

    opt = tf.optimizers.SGD(learning_rate=1e-6, momentum=0.8, nesterov=True)

    def one_step():
        with tf.GradientTape() as tape:
            verts1 = zero1 + p1_var * vec                 # inside the tape,
            verts2 = zero2 + p2_var * vec                 # as optimizer.py:216-218
            tri = lambda verts: (tf.gather(verts, faces[:, 0]),
                                 tf.gather(verts, faces[:, 1]),
                                 tf.gather(verts, faces[:, 2]))
            vp1, v11, v21 = tri(verts1)
            vp2, v12, v22 = tri(verts2)
            vp = tf.concat([vp1, vp2, tgt_vp], 0)
            v1 = tf.concat([v11, v12, tgt_v1], 0)
            v2 = tf.concat([v21, v22, tgt_v2], 0)
            nrm = tf.linalg.cross(v1 - vp, v2 - v1)

            p0, p1, rank = r_p0, r_p1, rank0
            finished_pts = []
            finished_rank = []
            for _ in range(3):
                valid, ray_u, _, _ = tri_intersect_dense(p0, p1, vp, v1, v2)
                inf = 2.0 * tf.reduce_max(ray_u) * tf.ones_like(ray_u)
                ray_u = tf.where(valid, ray_u, inf)
                closest = tf.argmin(ray_u, axis=0)
                any_valid = tf.reduce_any(valid, axis=0)
                rngi = tf.range(tf.shape(p0)[0], dtype=tf.int64)
                gidx = tf.stack([closest, rngi], axis=1)
                u_hit = tf.gather_nd(ray_u, gidx)
                hit = p0 + u_hit[:, None] * (p1 - p0)
                cat = tf.gather(category, closest)
                hit_norm = tf.gather(nrm, closest)
                is_fin = any_valid & (cat > 1.0)
                is_act = any_valid & (cat < 1.0)
                finished_pts.append(tf.boolean_mask(hit, is_fin))
                finished_rank.append(tf.boolean_mask(rank, is_fin))
                # compact to the reacting set (reference boolean_mask idiom)
                p0a = tf.boolean_mask(p0, is_act)
                hita = tf.boolean_mask(hit, is_act)
                norma = tf.boolean_mask(hit_norm, is_act)
                nina = tf.boolean_mask(tf.gather(n_in_tbl, closest), is_act)
                nouta = tf.boolean_mask(tf.gather(n_out_tbl, closest), is_act)
                rank = tf.boolean_mask(rank, is_act)
                p0, p1 = snell3d(p0a, hita, norma, nina, nouta)
            out = tf.concat(finished_pts, 0)
            rk = tf.concat(finished_rank, 0)
            goal = rk * (-2.0 * 0.2)
            err = tf.reduce_sum(tf.square(out[:, 1:] - goal))
        grads = tape.gradient(err, [p1_var, p2_var])
        grads = [tf.where(tf.math.is_finite(g), g, tf.zeros_like(g))
                 for g in grads]
        opt.apply_gradients(zip(grads, [p1_var, p2_var]))
        return err

    print(f"TF-CPU float64 depth-3 lens training step "
          f"({n_rays} rays x {n_tri} triangles, tape backward):")
    one_step()  # warmup
    times = []
    for i in range(steps):
        t0 = time.time()
        err = one_step()
        times.append(time.time() - t0)
        print(f"  step {i}: err={float(err):.4f}  {times[-1]*1e3:8.1f} ms")
    best = min(times)
    print(f"  measured: {best*1e3:.0f} ms/step (min of {steps})")
    return best


if __name__ == "__main__":
    import sys

    main()
    if "--3d" in sys.argv:
        lens_step_3d()
