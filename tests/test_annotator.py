"""COM annotator: occupancy/facade vs a direct port of the reference math."""
import numpy as np

from com_tpu.data.annotator import facade_type, occupancy_ratio


def test_facade_types():
    # box straight ahead on +x axis, heading +x: theta = 0 -> back facade (1)
    assert facade_type(np.array([10, 0, 0, 4, 2, 1.5, 0.0]), "Vehicle")[0] == 1
    # heading towards sensor: theta = 180 -> front facade (0)
    assert facade_type(np.array([10, 0, 0, 4, 2, 1.5, np.pi]), "Vehicle")[0] == 0
    # perpendicular: theta = 90 -> side (2)
    assert facade_type(np.array([10, 0, 0, 4, 2, 1.5, np.pi / 2]), "Vehicle")[0] == 2
    # oblique -> two facades (3)
    assert facade_type(np.array([10, 0, 0, 4, 2, 1.5, np.pi / 4]), "Vehicle")[0] == 3
    # non-vehicle -> -1
    assert facade_type(np.array([10, 0, 0, 1, 1, 1.7, 0.0]), "Pedestrian")[0] == -1


def test_vehicle_occupancy_full_and_empty():
    box = np.array([0, 0, 0, 4.8, 2.0, 1.6, 0.3])
    rng = np.random.RandomState(0)
    # dense fill: every one of the 12 cells gets >1 point
    local = rng.uniform(-0.49, 0.49, (2000, 3)) * box[3:6]
    c, s = np.cos(box[6]), np.sin(box[6])
    world = np.stack([local[:, 0] * c - local[:, 1] * s,
                      local[:, 0] * s + local[:, 1] * c,
                      local[:, 2]], axis=1)
    assert occupancy_ratio(world, box, "Vehicle") == 1.0
    assert occupancy_ratio(np.zeros((0, 3)), box, "Vehicle") == 0.0
    # a single point occupies one cell but th=1 needs >1 point
    one = world[:1]
    assert occupancy_ratio(one, box, "Vehicle") == 0.0
    two = np.concatenate([one, one + 1e-4])
    assert occupancy_ratio(two, box, "Vehicle") == 1 / 12


def test_ped_occupancy_slab_semantics():
    """Ped: 5 vertical slabs padded to 12 cells (reference pads 7 zeros,
    giving the 5/12 max ratio that the samplers rescale by 12/5)."""
    box = np.array([0, 0, 0, 0.9, 0.86, 1.7, 0.0])
    # one point in every slab
    zs = np.linspace(-0.8, 0.8, 5) * 1.7 / 1.7
    pts = np.stack([np.zeros(5), np.zeros(5), zs * 0.99], axis=1)
    r = occupancy_ratio(pts, box, "Pedestrian")
    assert abs(r - 5 / 12) < 1e-9
    # one point in the bottom slab only
    r1 = occupancy_ratio(np.array([[0, 0, -0.8]]), box, "Pedestrian")
    assert abs(r1 - 1 / 12) < 1e-9


def test_cyc_occupancy_length_slabs():
    box = np.array([0, 0, 0, 1.8, 0.8, 1.7, np.pi / 2])  # heading +y
    # points spread along the (rotated) length axis = y
    ys = np.linspace(-0.85, 0.85, 5)
    pts = np.stack([np.zeros(5), ys, np.zeros(5)], axis=1)
    r = occupancy_ratio(pts, box, "Cyclist")
    assert abs(r - 5 / 12) < 1e-9
