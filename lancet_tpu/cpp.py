"""Emulation of C++/libstdc++ semantics the reference's output depends on.

The reference's VCF bytes depend on C++ formatting and container behavior;
these helpers reproduce them exactly so the oracle engine can be
record-equal with compiled reference lancet.
"""

from __future__ import annotations

import hashlib


def ostream_float(x: float) -> str:
    """Default std::ostream float formatting (6 significant digits, %g-style).

    Used for FETS/SB scores and QUAL in VCF lines (ref: src/Variant.cc:219,
    src/util.cc:89-94 `dtos`).
    """
    return "%g" % x


def sha256_hex(s: str) -> str:
    """Hex sha256 of a variant signature (ref: src/VariantDB.cc:30, src/sha256.cc)."""
    return hashlib.sha256(s.encode()).hexdigest()


def std_lower_bound(vec, x):
    """`std::lower_bound` exactly as libstdc++ executes it, valid even on
    UNSORTED input (deterministic comparison sequence).

    The reference calls std::binary_search on mate-name vectors that are
    unsorted during graph construction (ref: src/Node.cc:638-661 with
    push_back at :665-671; sorted only later in buildgraph, Graph.cc:576-580),
    so we must reproduce the exact probe sequence, not "correct" search.
    """
    first = 0
    length = len(vec)
    while length > 0:
        half = length >> 1
        mid = first + half
        if vec[mid] < x:
            first = mid + 1
            length = length - half - 1
        else:
            length = half
    return first


def std_binary_search(vec, x) -> bool:
    """`std::binary_search` (lower_bound + equality probe), unsorted-safe."""
    i = std_lower_bound(vec, x)
    return i < len(vec) and not (x < vec[i])
