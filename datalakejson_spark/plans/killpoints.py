"""Driver-side crash-injection seams for the exactly-once test matrix.

The reference's durability story (sudo_code.txt:189-224 crash recovery,
psuedo_code.txt:252-259) is a set of claims about what happens when the
process dies at specific points. Each claim needs a test that ACTUALLY dies
there; these named seams make the kill points first-class instead of
scattering monkeypatches over private functions.

Production cost is one dict lookup per named point per batch (the dict is
empty outside tests). All seams are driver-side — executor-side failure is
Spark's own retry domain, already covered by task-level semantics.

``InjectedKill`` derives from BaseException ON PURPOSE: the ingest batch's
crash-recovery handler catches ``Exception`` (a soft failure that the dying
process itself can still record as FAILED); a hard death (SIGKILL, OOM-kill)
runs no handler at all. Raising InjectedKill emulates the hard death — it
sails through every ``except Exception`` exactly like the process vanishing,
leaving only the on-disk state behind.
"""

from __future__ import annotations

from collections.abc import Callable

_hooks: dict[str, Callable[[], None]] = {}


class InjectedKill(BaseException):
    """Emulated hard process death (bypasses ``except Exception`` handlers)."""


def fire(point: str) -> None:
    """Invoke the hook registered for ``point`` (no-op when none)."""
    hook = _hooks.get(point)
    if hook is not None:
        hook()


def arm(point: str, hook: Callable[[], None]) -> None:
    """Register ``hook`` at ``point`` (tests only; pair with disarm)."""
    _hooks[point] = hook


def kill_once(point: str) -> None:
    """Arm ``point`` to raise InjectedKill on its FIRST firing only — the
    standard crash-then-recover shape: run once (dies at the point), disarm
    happens implicitly, run again (recovery must complete)."""
    def die() -> None:
        _hooks.pop(point, None)
        raise InjectedKill(f"injected kill at {point}")

    _hooks[point] = die


def disarm(point: str | None = None) -> None:
    """Remove one hook, or all hooks when ``point`` is None."""
    if point is None:
        _hooks.clear()
    else:
        _hooks.pop(point, None)
