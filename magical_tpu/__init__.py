"""magical_tpu — a TPU-native reimplementation of the MAGICAL benchmark
suite (qxcv/magical): batched JAX physics + rendering, same tasks,
variants, preprocessors, scores, demo pipeline and evaluation protocol.

Facade mirrors /root/reference/magical/__init__.py:1-8.
"""

from magical_tpu.api.registry import (  # noqa: F401
    ALL_REGISTERED_ENVS, DEMO_ENVS_TO_TEST_ENVS_MAP, make, register_envs)
from magical_tpu.core.preproc import AVAILABLE_PREPROCESSORS  # noqa: F401


def __getattr__(name):
    # lazy imports to keep `import magical_tpu` light
    if name in ('load_demos', 'preprocess_demos_with_wrapper',
                'splice_in_preproc_name', 'MAGICALTrajectory'):
        from magical_tpu.data import trajectories
        return getattr(trajectories, name)
    if name == 'try_download_demos':
        from magical_tpu.data import reference_demos
        return reference_demos.try_download_demos
    raise AttributeError(name)


__version__ = '0.1.0'
