"""Opt-in persistent XLA compilation cache for the TPU bench/anchor paths.

First-compile is the dominant per-experiment tax at scale (SCALE.json:
fill_first_s 190-260 s, adj_step_first_s 308 s at the 107k-cell FSI
anchor; every bench process pays it again).  The reference stack has no
equivalent cost — FFCx kernels are compiled once to .so and dlopened
(SURVEY.md section 3) — so caching compiled TPU executables across
processes is the parity move.

Scope guard: the round-4 full-suite segfault was XLA:**CPU**'s
`deserialize_executable` dying after thousands of in-process reloads,
with cpu_aot_loader warning on machine-feature mismatch on every load
(CLAUDE.md round-5 findings).  CPU AOT reload is untrustworthy here, so
this helper is a no-op unless the first device is a TPU; the CPU test
suite stays cache-free (tests/conftest.py).

Measured through the axon remote tunnel (refine=0.5 motor fused step,
7.1 MB serialized executable): compile 98.2 s -> cached reload 33.1 s
(3.0x), loss bit-identical.  BUT the write path can stall long on big
programs: a refine=1 edge-delta step with the cache enabled sat >30 min
in serialize while the identical no-cache compile takes 2-8 min, and one
trivial-program reload took 59.8 s during the same window — the tunnel's
serialize endpoint is not reliably fast.  So this stays STRICTLY OPT-IN:
  FEMO_COMPILE_CACHE unset  -> disabled (the safe default)
  FEMO_COMPILE_CACHE=path   -> enabled at that directory (TPU only)

Usage: call `enable_persistent_cache()` BEFORE the first jit compilation
(after backend selection).
"""

import os

__all__ = ["enable_persistent_cache"]


def enable_persistent_cache(cache_dir=None):
    """Enable jax's persistent compilation cache (TPU only, opt-in).

    Returns the cache directory if enabled, else None.  Safe to call
    multiple times; safe to call on CPU (no-op).  Entries are keyed on
    (HLO, compile options, backend version) by jax, so stale-version hits
    are misses, not corruption.
    """
    env = os.environ.get("FEMO_COMPILE_CACHE", "")
    cache_dir = cache_dir or env
    if not cache_dir or cache_dir.lower() in ("0", "off", "none"):
        return None
    import jax

    if jax.devices()[0].platform == "cpu":
        return None
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache everything that took >1 s to compile: the per-entry disk cost
    # is trivial next to the 2-8 min remote-tunnel compiles being saved
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return cache_dir
