"""Robot model construction + URDF parser round-trip."""
import numpy as np

from deep_tracking_control_tpu.robot import quadrupeds
from deep_tracking_control_tpu.robot.model import load_urdf


def test_lite3_structure():
    m = quadrupeds.lite3()
    assert m.nb == 13 and m.nq == 12
    assert m.num_bodies == 17
    assert m.dynamic_body_names[0] == "TORSO"
    assert m.body_names[:5] == ("TORSO", "FL_HIP", "FL_THIGH", "FL_SHANK", "FL_FOOT")
    # 12 joints, order: per leg HipX, HipY, Knee  (Lite3.urdf document order)
    assert m.joint_names[0] == "FL_HipX_joint"
    assert m.joint_names[2] == "FL_Knee_joint"
    # total mass: torso 5.6056 + 4*(0.55+0.86+0.153+0.02) = 11.9376 kg
    np.testing.assert_allclose(m.mass.sum(), 11.9376, atol=1e-4)
    # effort/velocity limits from Lite3.urdf:58
    assert np.all(m.effort_limit == 30.0)
    assert np.all(m.vel_limit == 20.0)
    # feet welded 0.21012 below shanks (Lite3.urdf:151)
    np.testing.assert_allclose(m.foot_offset[:, 2], -0.21012)
    np.testing.assert_allclose(m.foot_radius, 0.022)


def test_x30_structure():
    m = quadrupeds.x30()
    assert m.nb == 13 and m.num_bodies == 17
    np.testing.assert_allclose(
        m.mass.sum(), 30.7 + 4 * (1.43 + 4.0809 + 0.71386 + 0.06), atol=1e-3)
    # asymmetric hip limits mirrored L/R (X30.urdf:58 vs :169)
    j = m.joint_names.index("FL_HipX_joint")
    assert m.pos_limit[j][1] > -m.pos_limit[j][0]
    j = m.joint_names.index("FR_HipX_joint")
    assert -m.pos_limit[j][0] > m.pos_limit[j][1]


def test_urdf_roundtrip(tmp_path):
    m = quadrupeds.lite3()
    p = tmp_path / "lite3.urdf"
    p.write_text(quadrupeds.to_urdf(m))
    m2 = load_urdf(str(p))
    assert m2.nb == m.nb
    assert m2.joint_names == m.joint_names
    assert m2.body_names == m.body_names
    np.testing.assert_allclose(m2.mass, m.mass, atol=1e-9)
    np.testing.assert_allclose(m2.com, m.com, atol=1e-9)
    np.testing.assert_allclose(m2.inertia, m.inertia, atol=1e-9)
    np.testing.assert_allclose(m2.joint_axis, m.joint_axis)
    np.testing.assert_allclose(m2.joint_t, m.joint_t)
    np.testing.assert_allclose(m2.pos_limit, m.pos_limit)
    np.testing.assert_allclose(m2.foot_offset, m.foot_offset)


def test_weld_merge_moves_com():
    # foot mass merged into shank shifts the shank COM downward
    m = quadrupeds.lite3()
    shank = m.dynamic_body_names.index("FL_SHANK")
    bare_com_z = -0.12157  # URDF shank inertial origin (Lite3.urdf:91)
    assert m.com[shank][2] < bare_com_z  # pulled toward the foot at -0.21012
    np.testing.assert_allclose(m.mass[shank], 0.153 + 0.02)
