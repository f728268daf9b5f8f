"""Run python on CPU (bypasses the axon TPU claim so benchmarks keep the
chip exclusively).  Usage:
  python tools/cpurun.py script.py [args...]
  python tools/cpurun.py -c 'code'
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

if sys.argv[1] == "-c":
    exec(sys.argv[2])
else:
    path = sys.argv[1]
    sys.argv = sys.argv[1:]
    exec(open(path).read())
