from youku_mplug_tpu.runtime.mesh import MeshConfig, make_mesh, local_batch_size
from youku_mplug_tpu.runtime.precision import Policy, DEFAULT_POLICY
from youku_mplug_tpu.runtime.prng import fold_in_axes, make_rngs

__all__ = [
    "MeshConfig",
    "make_mesh",
    "local_batch_size",
    "Policy",
    "DEFAULT_POLICY",
    "fold_in_axes",
    "make_rngs",
]
