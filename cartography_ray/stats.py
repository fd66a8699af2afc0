"""Scoped metrics emission (the reference's statsd parity surface).

Mirrors the BEHAVIOR of the reference's stats client
(/root/reference/cartography/stats.py: a hierarchy of scope-prefixed
proxies over one root client, disabled ⇒ every call is a no-op) without
its ``statsd`` dependency: the wire backend here is a ~15-line raw-UDP
emitter speaking the statsd line protocol (``name:value|type``), which
is fire-and-forget by design — it needs no listener, no library, and no
network round-trip, so it is safe to enable in this sandbox and from
inside Ray worker tasks alike.

Backends are pluggable:

- ``MemoryBackend`` — records events in-process; what the tests and any
  driver-side manifest enrichment read. Per-PROCESS state: metrics
  emitted inside Ray tasks land in that worker's recorder, so use it
  driver-side (or assert via the UDP backend) — the same caveat any
  in-process statsd fake has.
- ``UdpStatsdBackend`` — statsd line protocol over UDP to
  ``$GRAFT_STATSD`` (``host:port``). Datagrams from any process
  (driver or worker) converge on the collector, which is how statsd
  deployments aggregate multi-process pipelines.

Disabled (the default, like the reference until ``set_stats_client``)
⇒ zero overhead beyond one ``is_enabled`` check per call.
"""

from __future__ import annotations

import os
import socket
import time
from contextlib import contextmanager


class MemoryBackend:
    """In-process recorder: ``events`` is a list of (kind, stat, value)."""

    def __init__(self) -> None:
        self.events: list[tuple[str, str, float]] = []

    def emit(self, kind: str, stat: str, value: float) -> None:
        self.events.append((kind, stat, float(value)))

    def counters(self) -> dict[str, float]:
        out: dict[str, float] = {}
        for kind, stat, value in self.events:
            if kind == "c":
                out[stat] = out.get(stat, 0.0) + value
        return out


class UdpStatsdBackend:
    """statsd line protocol over UDP — stdlib-only, fire-and-forget.

    ``c`` → counter, ``g`` → gauge, ``ms`` → timer milliseconds. Send
    failures are swallowed (metrics must never take the pipeline down,
    the same contract statsd clients document).
    """

    def __init__(self, host: str, port: int) -> None:
        self._addr = (host, int(port))
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)

    def emit(self, kind: str, stat: str, value: float) -> None:
        if kind == "ms":
            payload = f"{stat}:{value:.3f}|ms"
        elif kind == "g":
            payload = f"{stat}:{value}|g"
        else:
            payload = f"{stat}:{int(value)}|c"
        try:
            self._sock.sendto(payload.encode("utf-8"), self._addr)
        except OSError:
            pass


class ScopedStats:
    """Scope-prefixed metrics proxy (the reference's ScopedStatsClient
    shape): ``get_stats_client("kg").get_stats_client("detect")`` emits
    under ``kg.detect.*``. All proxies share the ROOT's backend, so one
    ``set_backend`` enables/disables the whole hierarchy."""

    def __init__(self, prefix: str | None = None, root: "ScopedStats | None" = None):
        self._prefix = prefix
        self._root = root if root is not None else self
        if root is None:
            self._backend = None

    # -- wiring ------------------------------------------------------------

    def set_backend(self, backend) -> None:
        self._root._backend = backend

    def is_enabled(self) -> bool:
        return self._root._backend is not None

    def get_stats_client(self, scope: str) -> "ScopedStats":
        prefix = scope if not self._prefix else f"{self._prefix}.{scope}"
        return ScopedStats(prefix, self._root)

    # -- emission ----------------------------------------------------------

    def _emit(self, kind: str, stat: str, value: float) -> None:
        backend = self._root._backend
        if backend is None:
            return
        if self._prefix:
            stat = f"{self._prefix}.{stat}"
        backend.emit(kind, stat, value)

    def incr(self, stat: str, count: int = 1) -> None:
        self._emit("c", stat, count)

    def gauge(self, stat: str, value: float) -> None:
        self._emit("g", stat, value)

    def timing(self, stat: str, seconds: float) -> None:
        self._emit("ms", stat, seconds * 1000.0)

    @contextmanager
    def timer(self, stat: str):
        t0 = time.monotonic()
        try:
            yield
        finally:
            self.timing(stat, time.monotonic() - t0)


_ROOT = ScopedStats()


def get_stats_client(scope: str | None = None) -> ScopedStats:
    """Module-level accessor (the reference's ``get_stats_client``):
    returns the root client, or a scoped child when ``scope`` is given."""
    return _ROOT if scope is None else _ROOT.get_stats_client(scope)


def set_stats_backend(backend) -> None:
    """Enable metrics by installing a backend (None disables again)."""
    _ROOT.set_backend(backend)


def configure_from_env() -> bool:
    """Install the UDP backend when ``$GRAFT_STATSD=host:port`` is set
    (the opt-in the reference gates behind ``--statsd-enabled``).
    Returns True when a backend was installed."""
    target = os.environ.get("GRAFT_STATSD")
    if not target:
        return False
    host, _, port = target.rpartition(":")
    if not host or not port.isdigit():
        raise ValueError(f"GRAFT_STATSD must be host:port, got {target!r}")
    set_stats_backend(UdpStatsdBackend(host, int(port)))
    return True
