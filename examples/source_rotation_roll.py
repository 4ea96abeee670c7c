"""Source-rotation roll test: does aiming a source induce an unwanted roll?

Rebuild of /root/reference/dev/source_rotation_roll_test.py, which
demonstrates that 'vector' aiming (shortest-arc quaternion from +x to the
aim direction) rolls the source's base-point grid as the aim tilts off-axis,
and that explicit quaternion aiming avoids it.  The rebuild's sources keep
both modes (models/sources.py angle_type='vector'/'quaternion'); this script
MEASURES the roll instead of asking a human to notice it.

Roll definition: the base grid's local +y axis should map to the horizontal
direction h = z x aim (no roll).  The signed angle between the mapped axis
and h, about the aim axis, is the roll.

Run:  python examples/source_rotation_roll.py
"""

import math

import numpy as np

from tensorflowraytrace_tpu.models import distributions as dist
from tensorflowraytrace_tpu.models import sources as src
from tensorflowraytrace_tpu.utils import quaternion as quat

PI = math.pi


def grid_axes(source):
    """Sample the 3-point probe source and return its mapped local axes."""
    rays = source.sample()
    p = np.asarray(rays.p0)  # origin, +y probe, +z probe
    return p[1] - p[0], p[2] - p[0]


def measure_roll(aim, angle_type="vector", rotation=None):
    probe = dist.ManualBasePointDistribution(
        2, points=[[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
    angles = dist.ManualAngularDistribution([[1.0, 0.0, 0.0]] * 3)
    central = rotation if rotation is not None else tuple(aim)
    source = src.AngularSource(
        3, (0.0, 0.0, 0.0), central, angles, probe, [575.0] * 3,
        angle_type=angle_type, dense=False)
    u_img, _ = grid_axes(source)   # image of the base +y... (first 2D axis)
    aim = np.asarray(aim) / np.linalg.norm(aim)
    h = np.cross((0.0, 0.0, 1.0), aim)
    h /= np.linalg.norm(h)
    v = np.cross(aim, h)
    # signed roll of the mapped first axis in the (h, v) frame
    return math.degrees(math.atan2(float(u_img @ v), float(u_img @ h)))


def no_roll_quaternion(aim):
    """Compose yaw-then-pitch (no roll by construction), as the reference's
    fix does with explicit quaternions."""
    x, y, z = np.asarray(aim) / np.linalg.norm(aim)
    yaw = math.atan2(y, x)
    pitch = -math.asin(z)
    q_yaw = quat.quat_from_axis_angle((0.0, 0.0, 1.0), yaw)
    q_pitch = quat.quat_from_axis_angle((0.0, 1.0, 0.0), pitch)
    return np.asarray(quat.quat_multiply(q_yaw, q_pitch))


def main():
    print(f"{'aim direction':>24} | {'vector-aim roll':>16} | "
          f"{'quaternion-aim roll':>20}")
    offsets = [(20.0, 10.0, 0.0), (20.0, 0.0, 10.0), (20.0, 10.0, 10.0),
               (20.0, 10.0, 20.0), (5.0, 10.0, 20.0)]
    worst_vec = worst_quat = 0.0
    for aim in offsets:
        r_vec = measure_roll(aim, "vector")
        q = no_roll_quaternion(aim)
        r_quat = measure_roll(aim, "quaternion", rotation=q)
        worst_vec = max(worst_vec, abs(r_vec))
        worst_quat = max(worst_quat, abs(r_quat))
        print(f"{str(aim):>24} | {r_vec:14.2f}deg | {r_quat:18.2f}deg")
    print(f"\nworst |roll|: vector aiming {worst_vec:.2f} deg "
          f"(the reference's documented pitfall), explicit quaternion "
          f"{worst_quat:.2f} deg")
    assert worst_quat < 1e-5, "quaternion aiming must not roll"
    assert worst_vec > 1.0, "vector aiming should exhibit the documented roll"


if __name__ == "__main__":
    main()
