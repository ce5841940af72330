"""python -m com_tpu.ops.native.build — compile the native host ops."""
from . import build

if __name__ == "__main__":
    print("built", build(force=True))
