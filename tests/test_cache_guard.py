"""enable_persistent_cache must not re-enable cache writes when the
test harness has pinned them off.

Regression for the r3 verdict finding: tests/test_cli_kitti.py drives
cli.main() in-process, whose enable_persistent_cache() used to reset
jax_persistent_cache_min_compile_time_secs to 1.0 process-wide — re-
arming the XLA:CPU executable-serialization segfault the conftest
write-guard exists to avoid, for every test after it in the suite.
"""

import os

import jax
import pytest

from lvio_fusion_tpu.utils.cache import enable_persistent_cache


@pytest.mark.skipif(os.environ.get("LVIO_TEST_CACHE_WRITE") == "1",
                    reason="suite running with cache writes deliberately on")
def test_cache_guard_respects_write_sentinel():
    # conftest armed the sentinel
    assert jax.config.jax_persistent_cache_min_compile_time_secs >= 1e9
    before = jax.config.jax_compilation_cache_dir
    enable_persistent_cache()
    # the guard must leave BOTH the write threshold and the cache dir
    # exactly as the harness configured them
    assert jax.config.jax_persistent_cache_min_compile_time_secs >= 1e9
    assert jax.config.jax_compilation_cache_dir == before
