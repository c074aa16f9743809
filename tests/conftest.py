"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated on host CPU devices
(xla_force_host_platform_device_count) per the project test strategy.
"""
import os

os.environ['JAX_PLATFORMS'] = 'cpu'  # ambient env may hold the TPU backend
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    flags = (flags + ' --xla_force_host_platform_device_count=8').strip()
if 'xla_cpu_parallel_codegen_split_count' not in flags:
    # XLA:CPU's thunk runtime splits every executable into ~32 LLVM
    # modules for parallel codegen, each with its own unwinder/frame
    # registration. On this 1-core CI host the parallelism has no upside;
    # one module per executable compiles slightly faster here and cuts
    # the per-process compile/free churn ~32x. (It reduces, but does NOT
    # by itself avoid, the jaxlib churn crash documented in
    # pyproject.toml's xdist note — measured: the single-process suite
    # still crashed at the same test with this flag set.)
    flags = (flags + ' --xla_cpu_parallel_codegen_split_count=1').strip()
os.environ['XLA_FLAGS'] = flags

# the TPU-tunnel sitecustomize (PYTHONPATH=/root/.axon_site) registers and
# initializes the axon backend at interpreter start, before this file runs —
# the env vars alone are too late; force the platform at the config level too.
import jax
jax.config.update('jax_platforms', 'cpu')

# The persistent compilation cache is OFF inside the suite process. After
# enough XLA:CPU compile/free churn (~100 tests), jaxlib 0.9's executable
# (de)serializers segfault — executable.serialize() of a fresh
# SINGLE-device program, and deserialize of an intact entry, both
# reproduced deterministically at suite scale yet fine in a fresh
# interpreter (the crash is a page-aligned read fault inside libgcc_s's
# eh_frame machinery — process-state corruption in jaxlib, not bad cache
# bytes: a brand-new cache dir crashes identically). In-process tests
# therefore never run those code paths. Subprocess-spawning tests DO get a
# cache — fresh processes have no churn — via a microarch-keyed CPU dir
# (XLA:CPU executables are AOT'd for the host's exact features; jax's key
# ignores them, and loading a foreign-microarch entry crashes, so the TPU
# tunnel's shared /tmp/jaxcache is never reused here).
from fpl_plus_tpu.utils.jaxcache import cpu_microarch_tag

os.environ['JAX_COMPILATION_CACHE_DIR'] = (
    '/tmp/jaxcache-cpu-' + cpu_microarch_tag())
jax.config.update('jax_enable_compilation_cache', False)

import numpy as np
import pytest

# crash-safe cache writes for every in-process compile (subprocess-spawning
# tests go through the CLI, which applies the same hardening)
from fpl_plus_tpu.utils.jaxcache import harden_compilation_cache
harden_compilation_cache()


REFERENCE_DATASET = '/root/reference/dataset'


@pytest.fixture(scope='session')
def rng():
    return np.random.RandomState(2024)


@pytest.fixture(scope='session')
def fixture_dir(tmp_path_factory):
    """Directory of small synthetic NIfTI fixtures shared across tests."""
    from fpl_plus_tpu.io.nifti import ImageGeometry, NiftiImage, write_nifti
    d = tmp_path_factory.mktemp('nifti_fixtures')
    rs = np.random.RandomState(7)
    geom = ImageGeometry(origin=(-10., 20., 5.), spacing=(0.5, 0.5, 1.5),
                         direction=(1, 0, 0, 0, 1, 0, 0, 0, 1))
    vol = rs.normal(100., 30., size=(12, 40, 48)).astype(np.float32)
    lab = np.zeros((12, 40, 48), np.int16)
    lab[4:8, 10:20, 15:30] = 1
    write_nifti(NiftiImage(vol, geom), str(d / 'img.nii.gz'))
    write_nifti(NiftiImage(lab, geom), str(d / 'lab.nii.gz'))
    return d
