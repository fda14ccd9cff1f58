from pupiloptixlab_tpu.scene.scene import Scene, load_scene  # noqa: F401
from pupiloptixlab_tpu.scene.materials import Material, MatType  # noqa: F401
from pupiloptixlab_tpu.scene.emitters import Emitter, EmitterType  # noqa: F401
from pupiloptixlab_tpu.scene.shapes import Shape, ShapeInstance, ShapeType  # noqa: F401
from pupiloptixlab_tpu.scene.textures import (  # noqa: F401
    AddressMode,
    FilterMode,
    Texture,
    TextureType,
    checkerboard_texture,
    rgb_texture,
)
