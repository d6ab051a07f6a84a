"""Packaging surface (reference: /root/reference/setup.py,
requirements/*.txt, MANIFEST.in): the repo must be installable as a
standard setuptools package with the version single-sourced from
dsl_tpu/version.py. No pip run here (offline env) — we check the metadata
layer setup.py exposes and that the sdist manifest covers the lazy-built
native source."""
import os.path as osp
import subprocess
import sys

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))


def test_setup_metadata():
    out = subprocess.run(
        [sys.executable, "setup.py", "--name", "--version"],
        cwd=ROOT, capture_output=True, text=True, check=True)
    name, version = out.stdout.split()[-2:]
    assert name == "dsl_tpu"
    import dsl_tpu
    assert version == dsl_tpu.__version__


def test_version_info():
    from dsl_tpu.version import parse_version_info, version_info
    assert version_info[:2] == parse_version_info("0.1.0")[:2]
    assert parse_version_info("2.3.0rc1") == (2, 3, 0, "rc1")


def test_requirements_parse_and_cover_core_stack():
    sys.path.insert(0, ROOT)
    try:
        import setup as setup_mod
    finally:
        sys.path.pop(0)
    runtime = setup_mod.parse_requirements("requirements/runtime.txt")
    allreq = setup_mod.parse_requirements("requirements.txt")
    names = {r.split(">=")[0].split("==")[0].strip() for r in runtime}
    assert {"jax", "flax", "optax", "numpy"} <= names
    assert set(runtime) <= set(allreq)


def test_manifest_ships_native_source():
    with open(osp.join(ROOT, "MANIFEST.in")) as f:
        manifest = f.read()
    assert "dsl_tpu/native" in manifest and "*.cpp" in manifest
    assert osp.exists(osp.join(ROOT, "LICENSE"))
