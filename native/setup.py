"""Build the native host kernels: python native/setup.py build_ext --inplace

Produces ``kmbart_tpu/_native/kmbart_native.so`` (plain extern-"C" shared
object loaded via ctypes — no Python ABI dependency, so one build works for
every interpreter). ``kmbart_tpu._native`` also auto-builds it with g++ on
first import; this setup script exists for explicit/offline builds and for
toolchains where the auto-build is disabled.
"""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "kmbart_native.cpp")
OUT = os.path.join(HERE, "..", "kmbart_tpu", "_native", "kmbart_native.so")


def build():
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", SRC, "-o", OUT]
    print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    print(f"built {os.path.normpath(OUT)}")


if __name__ == "__main__":
    # accept the conventional `build_ext --inplace` (and plain) invocations
    if len(sys.argv) == 1 or "build" in sys.argv[1]:
        build()
    else:
        raise SystemExit(f"unknown command {sys.argv[1:]}; use build_ext")
