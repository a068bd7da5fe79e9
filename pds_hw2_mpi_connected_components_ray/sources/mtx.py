"""Reference-format conformance codecs: MatrixMarket `.mtx` and the
reference's binary CSC `.bin`.

These prove the engine's edge ingestion agrees with the reference
converter's semantics (FIXTURES.md section 5) -- they are NOT the
production ingest path (that's the pages->links extraction front-end).

MatrixMarket reader semantics mirror
/root/reference/src/converter/mtx_to_bin.c:
  - header `%%MatrixMarket matrix <coordinate|array> <field> <symm>`
    (:100-126); `symmetric` REQUIRED (:115-123)
  - coordinate entries `i j [val]`; pattern = no value; val != 0.0
    binarization (:198); 1-based -> 0-based (:199-200)
  - symmetric expansion: store (i,j) and, when i != j, (j,i) (:199-213);
    self-loops stored once (:207); duplicates NOT deduplicated (:303-317)
  - dense `array` form: column-major lower triangle incl. diagonal

Binary `.bin` layout (:9-17, :333-373):
  uint32 nrows | uint32 ncols | uint64 nnz |
  uint32 col_ptr[ncols+1] | uint32 row_idx[nnz]
where column u holds the (expanded, undirected) neighbor row indices of
vertex u -- i.e. our (src=col, dst=row) edge table grouped by src.
"""

from __future__ import annotations

import struct

import numpy as np


def read_mtx(path: str) -> tuple[int, np.ndarray]:
    """Parse a MatrixMarket file -> (n_vertices, directed expanded edges
    (m,2) int64) with the reference converter's exact semantics."""
    with open(path) as f:
        header = f.readline().strip()
        parts = header.split()
        if (
            len(parts) != 5
            or parts[0] != "%%MatrixMarket"
            or parts[1].lower() != "matrix"
        ):
            raise ValueError(f"bad MatrixMarket header: {header!r}")
        fmt, field, symm = parts[2].lower(), parts[3].lower(), parts[4].lower()
        if symm != "symmetric":
            # reference rejects non-symmetric inputs (mtx_to_bin.c:115-123)
            raise ValueError("only symmetric MatrixMarket inputs are supported")
        if fmt not in ("coordinate", "array"):
            raise ValueError(f"unsupported format {fmt}")
        line = f.readline()
        while line.startswith("%"):
            line = f.readline()
        dims = line.split()
        srcs: list[int] = []
        dsts: list[int] = []
        if fmt == "coordinate":
            nrows, ncols, nnz = int(dims[0]), int(dims[1]), int(dims[2])
            if nrows != ncols:
                raise ValueError("adjacency matrix must be square")
            count = 0
            for line in f:
                line = line.strip()
                if not line or line.startswith("%"):
                    continue
                toks = line.split()
                i, j = int(toks[0]), int(toks[1])
                if not (1 <= i <= nrows and 1 <= j <= ncols):
                    raise ValueError(f"entry out of bounds: {i} {j}")
                if field != "pattern":
                    if float(toks[2]) == 0.0:  # binarize (mtx_to_bin.c:198)
                        count += 1
                        continue
                a, b = i - 1, j - 1
                srcs.append(a)
                dsts.append(b)
                if a != b:  # symmetric expansion, self-loops once (:207)
                    srcs.append(b)
                    dsts.append(a)
                count += 1
            if count != nnz:
                raise ValueError(f"expected {nnz} entries, saw {count}")
        else:  # dense array form -- two accepted layouts
            # 1. SPEC layout: `array symmetric` stores only the
            #    column-major lower triangle incl. diagonal
            #    (n*(n+1)/2 values); each off-diagonal nonzero expands
            #    to both directions.
            # 2. REFERENCE layout (mtx_to_bin.c:218-245): a full
            #    nrows*ncols column-major block; EVERY nonzero (i,j)
            #    emits (i,j) and, when i != j, (j,i) -- so a symmetric
            #    full-dense file yields each undirected edge TWICE in
            #    each direction (duplicates kept, matching the
            #    converter's no-dedup COO, :303-317).
            # Any other value count is rejected loudly, never misparsed.
            nrows, ncols = int(dims[0]), int(dims[1])
            if nrows != ncols:
                raise ValueError("adjacency matrix must be square")
            vals = []
            for line in f:
                line = line.strip()
                if line and not line.startswith("%"):
                    vals.append(float(line))
            n_tri = nrows * (nrows + 1) // 2
            n_full = nrows * ncols
            if len(vals) == n_tri:
                k = 0
                for j in range(ncols):
                    for i in range(j, nrows):
                        if vals[k] != 0.0:
                            srcs.append(i)
                            dsts.append(j)
                            if i != j:
                                srcs.append(j)
                                dsts.append(i)
                        k += 1
            elif len(vals) == n_full:
                dense = np.asarray(vals, dtype=np.float64).reshape(ncols, nrows)
                jj, ii = np.nonzero(dense)  # scan order == file order
                offdiag = ii != jj
                counts = np.where(offdiag, 2, 1)
                pos = np.cumsum(counts) - counts  # entry -> output slot
                out_i = np.empty(int(counts.sum()), dtype=np.int64)
                out_j = np.empty_like(out_i)
                out_i[pos] = ii
                out_j[pos] = jj
                mp = pos[offdiag] + 1
                out_i[mp] = jj[offdiag]
                out_j[mp] = ii[offdiag]
                srcs, dsts = out_i, out_j
            else:
                raise ValueError(
                    f"array symmetric expects the stored lower triangle "
                    f"({n_tri} values) or the reference's full dense "
                    f"block ({n_full}), saw {len(vals)}"
                )
        edges = (
            np.stack(
                [np.array(srcs, dtype=np.int64), np.array(dsts, dtype=np.int64)], axis=1
            )
            if len(srcs)
            else np.empty((0, 2), dtype=np.int64)
        )
        return nrows, edges


def write_mtx(path: str, n: int, undirected_edges: np.ndarray) -> None:
    """Write a symmetric pattern MatrixMarket file from an edge array
    containing each undirected edge ONCE (a <= b)."""
    e = np.asarray(undirected_edges, dtype=np.int64)
    lo = np.minimum(e[:, 0], e[:, 1])
    hi = np.maximum(e[:, 0], e[:, 1])
    pairs = np.unique(np.stack([hi, lo], axis=1), axis=0)  # store lower triangle
    with open(path, "w") as f:
        f.write("%%MatrixMarket matrix coordinate pattern symmetric\n")
        f.write(f"{n} {n} {len(pairs)}\n")
        for i, j in pairs.tolist():
            f.write(f"{i + 1} {j + 1}\n")


def write_bin(path: str, n: int, expanded_edges: np.ndarray) -> None:
    """Write the reference's binary CSC from an EXPANDED (both
    directions) edge array: col=src, row=dst
    (/root/reference/src/converter/mtx_to_bin.c:9-17,322-375)."""
    e = np.asarray(expanded_edges, dtype=np.int64)
    if len(e) and (e.max() >= 2**32 or e.min() < 0):
        raise ValueError("vertex ids must fit uint32 for .bin conformance")
    order = np.lexsort((e[:, 1], e[:, 0])) if len(e) else np.array([], dtype=np.int64)
    col = e[order, 0] if len(e) else np.array([], dtype=np.int64)
    row = e[order, 1] if len(e) else np.array([], dtype=np.int64)
    col_ptr = np.zeros(n + 1, dtype=np.uint32)
    if len(col):
        counts = np.bincount(col, minlength=n)
        col_ptr[1:] = np.cumsum(counts)
    with open(path, "wb") as f:
        f.write(struct.pack("<II", n, n))
        f.write(struct.pack("<Q", len(row)))
        f.write(col_ptr.astype("<u4").tobytes())
        f.write(row.astype("<u4").tobytes())


def read_bin(path: str) -> tuple[int, np.ndarray]:
    """Read the reference's binary CSC -> (n, expanded edges (m,2)),
    with the loader's validity checks
    (/root/reference/src/matrix.c:180-197)."""
    with open(path, "rb") as f:
        nrows, ncols = struct.unpack("<II", f.read(8))
        (nnz,) = struct.unpack("<Q", f.read(8))
        col_ptr = np.frombuffer(f.read(4 * (ncols + 1)), dtype="<u4").astype(np.int64)
        row_idx = np.frombuffer(f.read(4 * nnz), dtype="<u4").astype(np.int64)
    if col_ptr[0] != 0 or col_ptr[-1] != nnz:
        raise ValueError("corrupt col_ptr bounds")
    if not np.all(np.diff(col_ptr) >= 0):
        raise ValueError("col_ptr not monotone")
    src = np.repeat(np.arange(ncols, dtype=np.int64), np.diff(col_ptr))
    return nrows, np.stack([src, row_idx], axis=1)
