"""Framework shell with no passes (the empty_gui analog)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pupiloptixlab_tpu.system import System


def main() -> None:
    system = System(has_display=True)
    system.set_scene("/root/reference/data/static/cornellbox.xml")
    system.run(max_frames=3)
    system.destroy()
    print("shell ran 3 empty frames")


if __name__ == "__main__":
    main()
