"""Reference-equivalent TF-CPU baseline for the performance sweep.

Implements the reference's trace algorithm faithfully -- TF2 eager, float64,
dense N x M meshgrid intersection + inf-fill + argmin + gather, 2-bounce
Python loop (tfrt geometry.py:27-167, engine.py:687-749, optimizer-free) --
to establish the wall-clock baseline the TPU rebuild is compared against
(BASELINE.md measurement task 2: "Time ... on TF-CPU reference vs the new
framework on TPU").  The reference itself cannot run here (it needs pyvista
and tfquaternion), so this is its hot loop re-created at spec.

Run:  python examples/baseline_tf_cpu.py
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


if __name__ == "__main__":
    main()
