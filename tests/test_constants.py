"""Spec constants: colours, action table, physics parameters."""

import math

import numpy as np

from magical_tpu import constants as C


def test_action_table_shape():
    assert C.ACTION_TABLE.shape == (18, 6)
    # every action carries exactly one of open/close
    assert np.all(C.ACTION_TABLE[:, 4] + C.ACTION_TABLE[:, 5] == 1)
    # first 9 open, last 9 close (entities.py:162-182)
    assert np.all(C.ACTION_TABLE[:9, 4] == 1)
    assert np.all(C.ACTION_TABLE[9:, 5] == 1)
    assert C.ACTION_NAMES[0] == 'Open'
    assert C.ACTION_NAMES[1] == 'UpOpen'
    assert C.ACTION_NAMES[8] == 'DownRightOpen'
    assert C.ACTION_NAMES[9] == 'Close'
    assert C.ACTION_NAMES[17] == 'DownRightClose'


def test_action_targets():
    # entities.py:439-457
    name_to_id = {n: i for i, n in enumerate(C.ACTION_NAMES)}
    assert C.ACTION_TARGET_SPEED[name_to_id['UpOpen']] == \
        np.float32(4 * C.ROBOT_RAD)
    assert C.ACTION_TARGET_SPEED[name_to_id['DownClose']] == \
        np.float32(-3 * C.ROBOT_RAD)
    assert C.ACTION_TURN_ANGLE[name_to_id['LeftOpen']] == 1.5
    assert C.ACTION_TURN_ANGLE[name_to_id['RightOpen']] == -1.5
    assert C.ACTION_FINGER_ANGLE[name_to_id['Open']] == \
        np.float32(math.pi / 8)
    assert C.ACTION_FINGER_ANGLE[name_to_id['Close']] == 0.0


def test_colours_match_reference_palette():
    # exact values of the reference's lightened Berkeley palette
    # (style.py:28-37), computed with the same colorsys transform
    np.testing.assert_allclose(
        C.COLOURS_RGB['blue'],
        (0.5302753494279764, 0.7257508251318621, 0.8278648796040409),
        rtol=1e-12)
    np.testing.assert_allclose(C.COLOURS_RGB['grey'],
                               (162 / 255, 163 / 255, 175 / 255), rtol=1e-12)
    # darken multiplies HLS lightness by 0.9
    dark = C.darken_rgb((0.5, 0.5, 0.5))
    np.testing.assert_allclose(dark, (0.45, 0.45, 0.45), atol=1e-12)


def test_phys_vars():
    assert C.PHYS_VAR_DEFAULTS.tolist() == [3.0, 1.0, 4.0, 1.5]\
        + [np.float32(0.1)]
    assert np.all(C.PHYS_VAR_LO <= C.PHYS_VAR_DEFAULTS)
    assert np.all(C.PHYS_VAR_DEFAULTS <= C.PHYS_VAR_HI)


def test_jitter_bounds():
    assert C.JITTER_POS_BOUND == 0.025
    assert abs(C.JITTER_ROT_BOUND - 0.05 * math.pi) < 1e-12
    assert abs(C.JITTER_TARGET_BOUND - 0.0075) < 1e-12
    assert C.DT == 1.0 / 80.0
