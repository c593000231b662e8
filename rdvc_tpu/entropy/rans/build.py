"""Build librdvc_rans.so with g++ (no pybind11 in this image; ctypes ABI)."""

from __future__ import annotations

import os
import subprocess
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(_HERE, "rans.cpp")
LIB = os.path.join(_HERE, "librdvc_rans.so")


def build(force: bool = False) -> str:
    if (
        not force
        and os.path.exists(LIB)
        and os.path.getmtime(LIB) >= os.path.getmtime(SRC)
    ):
        return LIB
    cmd = [
        "g++",
        "-O3",
        "-std=c++17",
        "-shared",
        "-fPIC",
        "-pthread",
        "-o",
        LIB,
        SRC,
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return LIB


if __name__ == "__main__":
    print(build(force="--force" in sys.argv))
