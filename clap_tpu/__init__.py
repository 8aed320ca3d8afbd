"""clap-tpu: TPU-native batched simulation + rendering engine.

Public API surface (mirrors the reference's layer structure — see
README.md's component map and SURVEY.md):

    from clap_tpu import mathx                      # linmath analogue
    from clap_tpu.engine.core import Engine, ClapConfig
    from clap_tpu.engine.step import engine_step, Inputs
    from clap_tpu.scene.loader import load_scene, save_scene
    from clap_tpu.scene.testbed import build_testbed
    from clap_tpu.render.pipeline import RenderOptions, render_frame
    from clap_tpu.parallel.sharding import env_mesh, shard_envs
"""

__version__ = "0.1.0"

from . import mathx  # noqa: F401
