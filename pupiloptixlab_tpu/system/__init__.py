from pupiloptixlab_tpu.system.buffers import Buffer, BufferDesc, BufferFlag, BufferManager  # noqa: F401
from pupiloptixlab_tpu.system.pass_base import Pass, PassTag  # noqa: F401
from pupiloptixlab_tpu.system.system import System  # noqa: F401
