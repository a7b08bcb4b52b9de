"""Host-side hang watchdog for distributed steps.

SURVEY.md §5: the reference has no failure detection; the build plan calls
for "multi-host barrier timeout handling around DCN collectives". A hung
collective (peer host died mid-psum) blocks the dispatching thread
forever with no diagnostics. This watchdog wraps any blocking section:

    wd = StepWatchdog(timeout_s=60.0, on_timeout=dump_state)
    with wd.watch("ba psum, frame 420"):
        out = step(state, batch)
        np.asarray(out.cost)   # value fetch = real sync

On expiry it fires `on_timeout(tag, elapsed)` from a daemon thread (log,
checkpoint, or os._exit for an elastic supervisor to restart the host)
while the main thread stays blocked — the only escalation possible when
the runtime offers no collective timeouts.
"""

from __future__ import annotations

import contextlib
import threading
import time
from typing import Callable


class StepWatchdog:
    def __init__(
        self,
        timeout_s: float = 60.0,
        on_timeout: Callable[[str, float], None] | None = None,
    ):
        self.timeout_s = timeout_s
        self.on_timeout = on_timeout or self._default_handler
        self.fired: list[str] = []  # tags that timed out (for tests/logs)

    @staticmethod
    def _default_handler(tag: str, elapsed: float) -> None:
        import sys

        print(
            f"[vo_tpu watchdog] step '{tag}' exceeded {elapsed:.1f}s — "
            "possible hung collective (dead peer host?)",
            file=sys.stderr,
            flush=True,
        )

    @contextlib.contextmanager
    def watch(self, tag: str = "step"):
        done = threading.Event()
        start = time.monotonic()

        def sentinel():
            if not done.wait(self.timeout_s):
                self.fired.append(tag)
                self.on_timeout(tag, time.monotonic() - start)

        t = threading.Thread(target=sentinel, daemon=True)
        t.start()
        try:
            yield self
        finally:
            done.set()
