"""Injectable filesystem openers shared by the Python DataSources
(``vf_warc``, ``vf_tar``): list + stream files on local disk, FUSE-style
mounts (``mount:<root>`` maps ``scheme://bucket/key`` under a local
root), or any fsspec-registered protocol (import-gated). See
sources/warcsource.py's module docstring for the full IO-option
contract; resolution is lazy and per-process so pickled readers
re-resolve on executors (and run the ``io_register`` hook there)."""

from __future__ import annotations

import fnmatch
import os


def _keep_name(name: str, glob: str | None) -> bool:
    """The shared listing filter: hidden ``.``/``_`` basenames excluded
    (binaryFile's convention) and ``glob`` matched against the BASENAME
    (stick to the ``*``/``?`` subset shared with Hadoop globs)."""
    if name.startswith((".", "_")):
        return False
    return not glob or fnmatch.fnmatch(name, glob)


def _strip_scheme(path: str) -> tuple[str, str]:
    if "://" in path:
        scheme, rest = path.split("://", 1)
        return scheme, rest
    return "file", path


class _LocalFS:
    """Opener for the local filesystem (plain and ``file://`` paths)."""

    def list_files(self, path: str, glob: str | None) -> list[str]:
        _, local = _strip_scheme(path)
        if os.path.isfile(local):
            return [local]
        out = []
        for root, dirs, names in os.walk(local):
            # hidden DIRECTORIES pruned too (Hadoop's convention): index
            # datasets like _url_index must never be listed as segments
            dirs[:] = [d for d in dirs if not d.startswith((".", "_"))]
            out.extend(os.path.join(root, n) for n in names if _keep_name(n, glob))
        return sorted(out)

    def open(self, path: str):
        _, local = _strip_scheme(path)
        return open(local, "rb")


class _MountFS:
    """Opener mapping ``scheme://bucket/key`` -> ``<root>/bucket/key`` —
    the FUSE-mount deployment shape (s3fs-fuse/goofys/gcsfuse present the
    bucket as a directory). Partition paths KEEP the object-store form so
    error rows and lineage name the real segment URL; only open/list
    translate. Stdlib-only, so it also serves as the deterministic test
    double for the opener contract."""

    def __init__(self, root: str):
        self.root = root

    def _to_local(self, path: str) -> str:
        _, rest = _strip_scheme(path)
        return os.path.join(self.root, rest.lstrip("/"))

    def list_files(self, path: str, glob: str | None) -> list[str]:
        scheme, rest = _strip_scheme(path)
        local = self._to_local(path)
        if os.path.isfile(local):
            return [path]
        out = []
        for root, dirs, names in os.walk(local):
            dirs[:] = [d for d in dirs if not d.startswith((".", "_"))]
            rel = os.path.relpath(root, self.root)
            for n in names:
                if _keep_name(n, glob):
                    out.append(f"{scheme}://{os.path.join(rel, n)}")
        return sorted(out)

    def open(self, path: str):
        return open(self._to_local(path), "rb")


class _FsspecFS:
    """Opener riding fsspec (import-gated): lists via ``fs.find`` and
    streams via ``fs.open`` — s3://, gs://, abfs://, memory://, whatever
    the installed fsspec stack registers. Holds only STRINGS so pickling
    to executors never ships a live client; each process resolves its own
    filesystem (and runs the ``io_register`` hook first — the place to
    install credentials or custom protocols)."""

    def __init__(self, sample_path: str, register: str | None):
        self.protocol = _strip_scheme(sample_path)[0]
        self.register = register

    def _fs(self):
        fs = getattr(self, "_fs_cache", None)
        if fs is None:
            if self.register:
                import importlib

                importlib.import_module(self.register)
            try:
                import fsspec
            except ImportError as e:
                raise ValueError(
                    "vf_warc io=fsspec requires the fsspec package (plus the "
                    "protocol's driver, e.g. s3fs) on driver and executors; "
                    "alternatives: io=mount:<root> over a FUSE mount, or "
                    "warcmini.read_warc_binaryfile (JVM scan, whole-file rows)"
                ) from e
            fs = self._fs_cache = fsspec.filesystem(self.protocol)
        return fs

    def __getstate__(self):
        d = self.__dict__.copy()
        d.pop("_fs_cache", None)
        return d

    def list_files(self, path: str, glob: str | None) -> list[str]:
        fs = self._fs()
        root = fs._strip_protocol(path)
        if fs.isfile(root):
            return [fs.unstrip_protocol(root)]
        return sorted(
            fs.unstrip_protocol(p)
            for p in fs.find(root)
            if _keep_name(p.rsplit("/", 1)[-1], glob)
            # hidden path COMPONENTS below the root excluded (dir pruning)
            and not any(
                c.startswith((".", "_"))
                for c in p[len(root):].strip("/").split("/")[:-1]
            )
        )

    def open(self, path: str):
        return self._fs().open(path, "rb")


def _resolve_io(io: str, path: str, register: str | None):
    """``io`` option string -> opener object. Raises the loud guidance
    ValueError for an object-store path with no usable backend."""
    scheme = _strip_scheme(path)[0]
    if io == "auto":
        if scheme == "file":
            io = "local"
        else:
            try:
                import fsspec  # noqa: F401

                io = "fsspec"
            except ImportError:
                raise ValueError(
                    f"vf_warc has no backend for scheme '{scheme}': install "
                    "fsspec (+ the protocol driver) for streaming reads, pass "
                    ".option('io', 'mount:<root>') over a FUSE mount, use "
                    "warcmini.read_warc_binaryfile (JVM binaryFile scan, "
                    "whole-file rows), or stage segments locally"
                ) from None
    if io == "local":
        if scheme != "file":
            raise ValueError(f"vf_warc io=local cannot open scheme '{scheme}'")
        return _LocalFS()
    if io == "fsspec":
        return _FsspecFS(path, register)
    if io.startswith("mount:"):
        return _MountFS(io[len("mount:"):])
    raise ValueError(f"vf_warc: unknown io backend {io!r} (local | fsspec | mount:<root>)")


def arrow_record_batches(rows, schema, max_rows: int = 256, max_bytes: int = 16 << 20,
                         size_idx: int | None = None):
    """Buffer row tuples into pyarrow RecordBatches — the Python
    DataSource fast path (one Arrow transfer per batch instead of
    per-row pickling). Flushes at ``max_rows`` or, when ``size_idx``
    names a row field holding a payload size, at ``max_bytes`` of
    accumulated payload — so a batch of 1 MB crawl documents stays
    memory-bounded while small-row scans still amortize."""
    import pyarrow as pa

    buf: list = []
    pending = 0

    def flush():
        cols = list(zip(*buf))
        return pa.RecordBatch.from_arrays(
            [pa.array(cols[i], type=f.type) for i, f in enumerate(schema)],
            schema=schema,
        )

    for row in rows:
        buf.append(row)
        if size_idx is not None:
            pending += row[size_idx] or 0
        if len(buf) >= max_rows or pending >= max_bytes:
            yield flush()
            buf = []
            pending = 0
    if buf:
        yield flush()
