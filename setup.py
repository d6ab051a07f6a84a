#!/usr/bin/env python
"""Install script (reference: /root/reference/setup.py — same layout:
version read from the package's version.py, requirements parsed from
requirements/*.txt). TPU-native differences: no Cython/CUDA extension
builds at install time — the one C++ helper library (dsl_tpu/native)
compiles lazily at first use with the system g++, so a plain pure-python
wheel installs everywhere, including TPU hosts without a toolchain."""
import os.path as osp

from setuptools import find_packages, setup


def readme():
    with open(osp.join(osp.dirname(__file__), "README.md"),
              encoding="utf-8") as f:
        return f.read()


def get_version():
    version_file = osp.join(osp.dirname(__file__), "dsl_tpu", "version.py")
    scope = {}
    with open(version_file) as f:
        exec(compile(f.read(), version_file, "exec"), scope)
    return scope["__version__"]


def parse_requirements(fname="requirements.txt"):
    """Flatten requirements files, following ``-r`` includes (the subset of
    pip syntax the reference's own parser handles that we actually use)."""
    here = osp.dirname(__file__)
    reqs = []
    with open(osp.join(here, fname)) as f:
        for line in f:
            line = line.split("#", 1)[0].strip()
            if not line:
                continue
            if line.startswith("-r "):
                reqs.extend(parse_requirements(line.split(None, 1)[1]))
            else:
                reqs.append(line)
    return reqs


SETUP_KWARGS = dict(
    name="dsl_tpu",
    version=get_version(),
    description="TPU-native semi-supervised object detection framework "
                "(Dense Learning / DSL, CVPR 2022) on JAX/XLA/Pallas",
    long_description=readme(),
    long_description_content_type="text/markdown",
    author="dsl_tpu contributors",
    keywords="semi-supervised object detection, TPU, JAX, dense learning",
    url="https://github.com/example/dsl_tpu",
    packages=find_packages(exclude=("tests", "tests.*", "tools", "tools.*",
                                    "configs", "configs.*", "demo",
                                    "demo.*")),
    package_data={
        # lazy-built C++ host helpers ship as source
        "dsl_tpu.native": ["src/*.cpp"],
    },
    include_package_data=True,
    classifiers=[
        "Development Status :: 4 - Beta",
        "Operating System :: OS Independent",
        "Programming Language :: Python :: 3.10",
        "Programming Language :: Python :: 3.11",
    ],
    license="Apache License 2.0",
    python_requires=">=3.10",
    install_requires=parse_requirements("requirements/runtime.txt"),
    extras_require={
        "all": parse_requirements("requirements.txt"),
        "tests": parse_requirements("requirements/tests.txt"),
        "optional": parse_requirements("requirements/optional.txt"),
    },
    zip_safe=False,
)

if __name__ == "__main__":     # setuptools' PEP-517 backend execs this file
    setup(**SETUP_KWARGS)      # with __name__ == "__main__", so pip works;
                               # plain import (tests) stays side-effect-free
