"""Run XLA backend compiles on a dedicated big-stack thread.

XLA:CPU's LLVM pipeline recurses deeply on the long dynamic-update-slice
chains our limb kernels emit.  The recursion runs on the *calling* thread;
the main thread's stack can only grow until it hits the next mapping, so a
long-running process (a full pytest session) segfaults nondeterministically
inside backend_compile even with RLIMIT_STACK raised.  A worker thread
created with an explicit 1 GiB ``threading.stack_size`` has a dedicated
mapping and is immune.

This has no analog in the reference (its "compiler" is the wasmbuilder JS
codegen); it is purely a host-toolchain workaround.
"""

from __future__ import annotations

import threading

_STACK_BYTES = 1 << 30
_installed = False


def install() -> None:
    """Monkeypatch jax's backend_compile entry point (idempotent)."""
    global _installed
    if _installed:
        return
    import jax._src.compiler as _jc

    for name in ("backend_compile_and_load", "backend_compile"):
        orig = getattr(_jc, name, None)
        if orig is None:
            continue
        setattr(_jc, name, _wrap(orig))
        _installed = True
        return


def _wrap(fn):
    def run_on_big_stack(*args, **kwargs):
        result: dict = {}

        def target():
            try:
                result["value"] = fn(*args, **kwargs)
            except BaseException as exc:  # re-raised on the caller
                result["exc"] = exc

        old = threading.stack_size()
        try:
            threading.stack_size(_STACK_BYTES)
            t = threading.Thread(target=target, name="xla-compile-bigstack")
            t.start()
        finally:
            threading.stack_size(old)
        t.join()
        if "exc" in result:
            raise result["exc"]
        return result["value"]

    return run_on_big_stack
