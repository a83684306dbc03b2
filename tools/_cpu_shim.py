"""Run a repo CLI script on the CPU backend: ``python tools/_cpu_shim.py
<script.py> [args...]``.

The env pins JAX_PLATFORMS=axon and sitecustomize imports jax at
interpreter startup, so an env var cannot force CPU (CLAUDE.md) — only an
in-process ``jax.config.update`` before any computation can. Used by
tools (e.g. parity_run.py --cpu) that must drive the shipped CLIs off the
TPU, e.g. while the chip is busy or the tunnel is down.
"""
import os
import runpy
import sys

import jax

jax.config.update("jax_platforms", "cpu")

script = sys.argv[1]
sys.argv = sys.argv[1:]
# mimic direct `python script.py` execution: the script's own directory
# leads sys.path (this shim's dir — tools/ — is there instead and would
# shadow the repo root the CLIs import from)
sys.path[0] = os.path.dirname(os.path.abspath(script))
runpy.run_path(script, run_name="__main__")
