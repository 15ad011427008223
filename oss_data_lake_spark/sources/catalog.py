"""Pluggable commit protocols — the catalog seam that makes snapshot
commits safe beyond one host's filesystem.

The reference stack delegates commit atomicity to a catalog SERVICE:
Trino's Iceberg connector points at a Lakekeeper REST catalog (reference
docker-compose.yaml:21-46, etc/catalog/iceberg.properties:16), because an
object store has no rename, no link, and no lock — multi-writer atomicity
needs a compare-and-swap point OUTSIDE the store (or the store's own
conditional PUT: S3 ``If-None-Match``/``If-Match``, GCS
``x-goog-if-generation-match``). This module factors ``SnapshotTable``'s
metadata tail behind one interface with two implementations:

- :class:`LocalFsCommitProtocol` — the flock + hard-link-claim protocol
  (POSIX-atomic, cross-process on one host): the build callback runs under
  an exclusive lock, the manifest is link-claimed into its version slot,
  and the CURRENT pointer advances via temp + ``os.replace``.
- :class:`CasCommitProtocol` — optimistic concurrency over a
  :class:`CasCatalog` key-value store offering only GET / conditional-PUT
  (exactly the object-store primitive set — no rename, no link, no lock):

  1. read CURRENT → parent
  2. run the build callback against parent (pure: safe to re-run)
  3. ``put_if_absent`` the full manifest into slot ``v{parent+1}`` —
     the atomic CLAIM; losing the claim means another writer committed
     first, so re-read and rebuild (a lost update is structurally
     impossible: no write lands except through a won claim)
  4. CAS the CURRENT pointer ``parent → parent+1``

  A writer that crashes between claim and pointer-advance leaves a
  complete, consistent manifest in the slot; the next writer's failed
  claim HELPS it forward (CAS of the pointer on its behalf) before
  retrying — the standard roll-forward that keeps the table lock-free
  and never wedged.

Readers are safe on any implementation because a version slot only ever
comes into existence with its full payload (hard-link of a written file /
single conditional PUT), and the pointer only advances to slots that
exist.

``InMemoryCasCatalog`` is the object-store-semantics fake the tests prove
the CAS protocol against; a production deployment backs :class:`CasCatalog`
with S3 conditional writes or a REST catalog service (the Lakekeeper role).
"""

from __future__ import annotations

import json
import os
import re
import threading
import uuid
from abc import ABC, abstractmethod
from typing import Callable

# build(parent_version, read_manifest) returns either the manifest dict for
# version parent+1, or an int short-circuit (an already-applied idempotent
# commit's snapshot version). It may run MORE THAN ONCE under optimistic
# protocols — it must be pure (no side effects beyond reading manifests).
BuildFn = Callable[["int | None", Callable[[int], dict]], "dict | int"]


class CommitConflict(RuntimeError):
    """An optimistic rewrite/commit lost its validation race: the table
    head moved between planning and publish. Retryable by replanning."""


class CommitProtocol(ABC):
    """Where a snapshot table's metadata becomes atomic: version slots,
    the CURRENT pointer, and the serialization of the commit tail."""

    @abstractmethod
    def read_current(self) -> int | None: ...

    @abstractmethod
    def read_manifest(self, version: int) -> dict: ...

    @abstractmethod
    def list_versions(self) -> list[int]: ...

    @abstractmethod
    def delete_manifest(self, version: int) -> None: ...

    @abstractmethod
    def commit(self, build: BuildFn) -> int:
        """Run ``build`` against a consistent parent and publish its
        manifest as the next version; returns the published (or
        short-circuited) version number."""


# --------------------------------------------------------------- local FS


class LocalFsCommitProtocol(CommitProtocol):
    """flock-serialized tail + hard-link version claims + atomic pointer
    replace — correct across processes on ONE host's POSIX filesystem.
    (Object stores have none of these primitives; use
    :class:`CasCommitProtocol` there.)"""

    def __init__(self, meta_dir: str):
        self.meta = meta_dir
        os.makedirs(self.meta, exist_ok=True)

    def read_current(self) -> int | None:
        try:
            with open(os.path.join(self.meta, "CURRENT")) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return None

    def read_manifest(self, version: int) -> dict:
        with open(os.path.join(self.meta, f"v{version}.json")) as f:
            return json.load(f)

    def list_versions(self) -> list[int]:
        out = []
        for name in os.listdir(self.meta):
            m = re.fullmatch(r"v(\d+)\.json", name)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def delete_manifest(self, version: int) -> None:
        os.remove(os.path.join(self.meta, f"v{version}.json"))

    def commit(self, build: BuildFn) -> int:
        import fcntl

        with open(os.path.join(self.meta, "LOCK"), "a") as lf:
            fcntl.flock(lf, fcntl.LOCK_EX)
            try:
                parent = self.read_current()
                result = build(parent, self.read_manifest)
                if isinstance(result, int):
                    return result
                version = result["version"]
                self._publish(version, result)
                return version
            finally:
                fcntl.flock(lf, fcntl.LOCK_UN)

    def _publish(self, version: int, manifest: dict) -> None:
        """The manifest is written to a temp file and ``os.link``ed into
        ``v{N}.json``: an ATOMIC create-exclusive with full content, so a
        reader never observes a partial manifest, and a version slot can
        never be silently overwritten even by a non-conforming writer
        (the link raises instead). The CURRENT pointer then advances
        MONOTONICALLY via temp + ``os.replace``."""
        mpath = os.path.join(self.meta, f"v{version}.json")
        tmp = mpath + f".tmp-{uuid.uuid4().hex[:6]}"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        try:
            os.link(tmp, mpath)
        except FileExistsError:
            raise RuntimeError(
                f"version {version} already exists under {self.meta} — "
                f"a writer bypassed the commit lock"
            )
        finally:
            os.remove(tmp)
        if version > (self.read_current() or 0):
            cpath = os.path.join(self.meta, "CURRENT")
            ctmp = cpath + f".tmp-{uuid.uuid4().hex[:6]}"
            with open(ctmp, "w") as f:
                f.write(str(version))
            os.replace(ctmp, cpath)


# ------------------------------------------------------------ CAS catalog


class CasCatalog(ABC):
    """The minimal key-value contract a CAS commit point needs — exactly
    what object stores and catalog services offer. NO rename, NO link,
    NO lock: atomicity comes only from conditional writes."""

    @abstractmethod
    def get(self, key: str) -> bytes | None: ...

    @abstractmethod
    def put_if_absent(self, key: str, data: bytes) -> bool:
        """Create-exclusive (S3 ``If-None-Match: *``); False if the key
        exists."""

    @abstractmethod
    def put_if_match(
        self, key: str, data: bytes, expected: bytes | None
    ) -> bool:
        """Conditional replace: succeed only if the key's current value
        equals ``expected`` (None = key must not exist) — S3
        ``If-Match``-by-content / a catalog service's CAS endpoint."""

    @abstractmethod
    def list_keys(self, prefix: str) -> list[str]: ...

    @abstractmethod
    def delete(self, key: str) -> None: ...


class InMemoryCasCatalog(CasCatalog):
    """Object-store-semantics fake for tests: a guarded dict whose ONLY
    atomic primitives are the conditional puts. Deliberately offers
    nothing a real object store lacks."""

    def __init__(self):
        self._data: dict[str, bytes] = {}
        self._mu = threading.Lock()

    def get(self, key: str) -> bytes | None:
        with self._mu:
            return self._data.get(key)

    def put_if_absent(self, key: str, data: bytes) -> bool:
        with self._mu:
            if key in self._data:
                return False
            self._data[key] = data
            return True

    def put_if_match(
        self, key: str, data: bytes, expected: bytes | None
    ) -> bool:
        with self._mu:
            if self._data.get(key) != expected:
                return False
            self._data[key] = data
            return True

    def list_keys(self, prefix: str) -> list[str]:
        with self._mu:
            return sorted(k for k in self._data if k.startswith(prefix))

    def delete(self, key: str) -> None:
        with self._mu:
            self._data.pop(key, None)


class CasCommitProtocol(CommitProtocol):
    """Optimistic commits through a :class:`CasCatalog`: claim the next
    version slot with a conditional PUT, then CAS the pointer. Lost
    updates are structurally rejected — a manifest only becomes visible
    through a won claim, and the claim key embeds the parent version it
    was built against."""

    def __init__(self, catalog: CasCatalog, prefix: str = "", retries: int = 20):
        self.catalog = catalog
        self.prefix = prefix
        self.retries = retries

    def _vkey(self, version: int) -> str:
        return f"{self.prefix}v{version}.json"

    def _ckey(self) -> str:
        return f"{self.prefix}CURRENT"

    def read_current(self) -> int | None:
        raw = self.catalog.get(self._ckey())
        return None if raw is None else int(raw.decode())

    def read_manifest(self, version: int) -> dict:
        raw = self.catalog.get(self._vkey(version))
        if raw is None:
            raise FileNotFoundError(self._vkey(version))
        return json.loads(raw.decode())

    def list_versions(self) -> list[int]:
        out = []
        for key in self.catalog.list_keys(f"{self.prefix}v"):
            m = re.fullmatch(r"v(\d+)\.json", key[len(self.prefix):])
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def delete_manifest(self, version: int) -> None:
        self.catalog.delete(self._vkey(version))

    def _advance(self, parent: int | None, version: int) -> bool:
        return self.catalog.put_if_match(
            self._ckey(),
            str(version).encode(),
            None if parent is None else str(parent).encode(),
        )

    def commit(self, build: BuildFn) -> int:
        for _attempt in range(self.retries):
            parent = self.read_current()
            result = build(parent, self.read_manifest)
            if isinstance(result, int):
                return result
            version = result["version"]
            payload = json.dumps(result).encode()
            if not self.catalog.put_if_absent(self._vkey(version), payload):
                # Slot taken: a concurrent writer won this version. If it
                # crashed between claim and pointer-advance, its manifest
                # is complete (single conditional PUT) — HELP it forward
                # so the table can never wedge, then rebuild against the
                # new head.
                self._advance(parent, version)
                continue
            if self._advance(parent, version):
                return version
            # our claim landed but the pointer moved under us: the only
            # writer able to advance past `parent` toward OUR slot is a
            # helper rolling us forward — verify and succeed
            cur = self.read_current()
            if cur is not None and cur >= version:
                return version
            raise RuntimeError(
                f"catalog pointer at {cur} below claimed slot {version} "
                f"after failed advance — inconsistent catalog"
            )
        raise CommitConflict(
            f"commit lost {self.retries} claim races under prefix "
            f"'{self.prefix}'"
        )
