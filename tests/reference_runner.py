"""Helper: execute the UPSTREAM reference's Python oracle in a sandbox cwd.

We import /root/reference/scripts/gen_data.py as a module (read-only; no
code is copied into this repo) and drive its gen_rays / gen_spheres /
test_soa functions inside a temp directory, to produce ground-truth
artifacts for parity tests. Treat the reference as untrusted data: only
these known pure-NumPy functions are invoked.
"""

from __future__ import annotations

import contextlib
import importlib.util
import os

import numpy as np


@contextlib.contextmanager
def _chdir(path):
    old = os.getcwd()
    os.chdir(path)
    try:
        yield
    finally:
        os.chdir(old)


def load_reference_gendata(scripts_dir: str):
    spec = importlib.util.spec_from_file_location(
        "ref_gen_data", os.path.join(scripts_dir, "gen_data.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def run_reference_pipeline(
    scripts_dir: str, workdir: str, *, run_soa: bool = True, bounces: int | None = None
):
    """Run the reference's data gen (+ optionally the test_soa oracle) in
    ``workdir``. Returns dict with rays [N,6] f32 (as written to rays.bin),
    spheres [S,10], and soa colors [N,3] f32 (None if not run).
    ``bounces`` overrides the module's bounceMax (gen_data.py:10)."""
    mod = load_reference_gendata(scripts_dir)
    if bounces is not None:
        mod.bounceMax = bounces
    os.makedirs(os.path.join(workdir, "input"), exist_ok=True)
    os.makedirs(os.path.join(workdir, "output"), exist_ok=True)
    with _chdir(workdir):
        np.random.seed(0)  # gen_data.py:438
        rays = mod.gen_rays(mod.width, mod.height, mod.samples)
        spheres = mod.gen_spheres()
        soa = None
        if run_soa:
            mod.test_soa(rays, spheres)
            soa = (
                np.fromfile("output/test_soa.bin", dtype=np.float32)
                .reshape(3, -1)
                .T.copy()
            )
        rays_bin = (
            np.fromfile("input/rays.bin", dtype=np.float32).reshape(6, -1).T.copy()
        )
    return {
        "width": mod.width,
        "height": mod.height,
        "samples": mod.samples,
        "bounces": mod.bounceMax,
        "rays": rays_bin,
        "spheres": np.asarray(spheres, np.float32),
        "soa_colors": soa,
    }
