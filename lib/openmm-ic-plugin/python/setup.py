"""Build the openmm_ic Python extension from the SWIG wrapper."""

import os
import platform

from setuptools import Extension, setup

openmm_dir = os.environ.get("OPENMM_DIR", "/usr/local/openmm")
plugin_header_dir = os.environ.get(
    "ICPLUGIN_HEADER_DIR",
    os.path.join(os.path.dirname(__file__), "..", "openmmapi",
                 "include"),
)
plugin_library_dir = os.environ.get("ICPLUGIN_LIBRARY_DIR", ".")

extra_compile_args = ["-std=c++14"]
extra_link_args = []
if platform.system() == "Darwin":
    extra_link_args += ["-Wl,-rpath," + os.path.join(openmm_dir, "lib")]

extension = Extension(
    name="_openmm_ic",
    sources=["ICPluginWrapper.cpp"],
    libraries=["OpenMM", "OpenMMIC"],
    include_dirs=[
        os.path.join(openmm_dir, "include"),
        plugin_header_dir,
    ],
    library_dirs=[os.path.join(openmm_dir, "lib"), plugin_library_dir],
    extra_compile_args=extra_compile_args,
    extra_link_args=extra_link_args,
)

setup(
    name="openmm-ic",
    version="1.0.0",
    description=(
        "OpenMM integrators implementing the method of image charges"
    ),
    py_modules=["openmm_ic"],
    ext_modules=[extension],
)
