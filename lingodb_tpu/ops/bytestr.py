"""Device-side byte-tensor string matching for high-cardinality dictionaries.

TPU-native analogue of the reference StringRuntime's byte-level matchers
(reference: src/runtime/StringRuntime.cpp — like/starts_with/ends_with run
over raw bytes per tuple). Low-cardinality dictionaries keep the host LUT
path (ops/strings.py); at ClickBench-scale cardinality (~10^6 distinct URLs)
the host loop is the bottleneck, so the dictionary itself moves to the
device ONCE as a padded (D, Lpad) uint8 plane and every LIKE/prefix/suffix/
contains evaluates as vectorized byte compares on the VPU.

LIKE evaluation uses greedy leftmost segment matching (provably equivalent
to the backtracking semantics for %-separated literal segments): for each
segment a (D, P) match matrix via shifted byte compares, then the earliest
admissible position per row advances a cursor. `_` wildcards are per-byte
holes in the compare; this is exact for ASCII and for any pattern without
`_`/`ilike` over non-ASCII data (the plane builder detects non-ASCII and
routes those back to the host).
"""

from __future__ import annotations

import numpy as np

# dictionaries below this stay on the host LUT path: plane build + device
# dispatch costs more than a small Python loop
DEVICE_DICT_MIN = 1 << 14

# id(dictionary) -> (dictionary ref, planes dict). Strong ref to the
# dictionary keeps ids stable; bounded to the working set of one query.
_PLANE_CACHE: dict[int, tuple] = {}

# (id(dictionary), pattern, ci) -> concrete device mask. Device LIKE masks
# depend only on the dictionary + pattern, so one eager evaluation serves
# every trace that uses the pair.
_MASK_CACHE: dict[tuple, tuple] = {}


def _planes(dictionary: np.ndarray):
    """(bytes2d (D, Lpad) uint8 device, lens (D,) int32 device, ascii_only,
    exact). Built once per dictionary object; exact=False flags embedded
    NUL bytes (S-dtype trims them — the planes are then truncated and
    device matching must fall back to the host path).

    The device arrays are materialized under jax.ensure_compile_time_eval():
    _planes is routinely first-hit while an outer fused program is being
    traced, and caching tracer-backed arrays poisons every later query
    that shares the dictionary (the r4 all-22 q13 UnexpectedTracerError)."""
    key = id(dictionary)
    hit = _PLANE_CACHE.get(key)
    if hit is not None and hit[0] is dictionary:
        return hit[1]
    import jax
    import jax.numpy as jnp

    enc = np.char.encode(dictionary.astype(str), "utf-8")
    lens = np.char.str_len(enc).astype(np.int32)
    lmax = max(1, int(lens.max()) if lens.size else 1)
    lpad = -(-lmax // 128) * 128
    buf = np.zeros((len(enc), lpad), np.uint8)
    view = enc.astype(f"S{lpad}").view(np.uint8).reshape(len(enc), lpad)
    buf[:] = view
    ascii_only = bool(buf.max(initial=0) < 128)
    # Embedded/trailing NUL detection: S-dtype element access trims trailing
    # \x00 (so both np.char.str_len(enc) and len(enc[i]) under-count), and
    # 'a\x00' would silently match as 'a' on the device while the host path
    # sees the real 2-byte string. True byte lengths must come from the
    # ORIGINAL strings, before any S-dtype conversion.
    exact = True
    if lens.size:
        true_lens = np.fromiter(
            (len(str(x).encode("utf-8")) for x in dictionary),
            np.int32, len(dictionary))
        exact = bool(np.array_equal(true_lens, lens))
    with jax.ensure_compile_time_eval():
        out = (jnp.asarray(buf), jnp.asarray(lens), ascii_only, exact)
    if len(_PLANE_CACHE) >= 8:
        # evict the single oldest entry (insertion-ordered dict): each entry
        # pins a (D, Lpad) uint8 device plane — clearing everything would
        # rebuild every plane when a workload cycles through >8 dictionaries
        _PLANE_CACHE.pop(next(iter(_PLANE_CACHE)))
    _PLANE_CACHE[key] = (dictionary, out)
    return out


def _tokenize(pattern: str, escape: str = "\\"):
    """LIKE pattern -> (segments, anchored_start, anchored_end). Each segment
    is a list of (byte, is_wildcard) for one %-free run; None when the
    pattern needs the host path (non-ASCII bytes are allowed — only
    multi-byte-aware `_` forces host, handled by the caller)."""
    segs: list[list[tuple[int, bool]]] = [[]]
    i = 0
    while i < len(pattern):
        c = pattern[i]
        if c == escape and i + 1 < len(pattern):
            for b in pattern[i + 1].encode("utf-8"):
                segs[-1].append((b, False))
            i += 2
            continue
        if c == "%":
            segs.append([])
        elif c == "_":
            segs[-1].append((0, True))
        else:
            for b in c.encode("utf-8"):
                segs[-1].append((b, False))
        i += 1
    # anchors are structural: an unescaped leading/trailing % is the only
    # thing that leaves an empty first/last segment (escaped chars append)
    anchored_start = not (len(segs) > 1 and not segs[0])
    anchored_end = not (len(segs) > 1 and not segs[-1])
    # drop empty middle segments (%% == %); keep empty first/last for anchors
    mid = [s for s in segs[1:-1] if s]
    segments = [segs[0]] + mid + ([segs[-1]] if len(segs) > 1 else [])
    return segments, anchored_start, anchored_end


def _fold(x):
    """ASCII lowercase on a uint8 tensor."""
    import jax.numpy as jnp

    up = (x >= 65) & (x <= 90)
    return jnp.where(up, x + 32, x)


def device_like_mask(dictionary: np.ndarray, pattern: str,
                     case_insensitive: bool = False):
    """Per-dictionary-entry LIKE mask computed on the device, or None when
    the pattern/data needs the host path. Returns a jax bool (D,) array.

    Always evaluates EAGERLY (jax.ensure_compile_time_eval) and caches the
    concrete mask per (dictionary, pattern, ci): when first hit inside the
    tracing of a fused program, the mask enters that program as a constant
    instead of re-deriving (and leaking) per-trace intermediates."""
    ck = (id(dictionary), pattern, case_insensitive)
    hit = _MASK_CACHE.get(ck)
    if hit is not None and hit[0] is dictionary:
        return hit[1]
    mask = _device_like_mask_uncached(dictionary, pattern, case_insensitive)
    if len(_MASK_CACHE) >= 64:
        _MASK_CACHE.pop(next(iter(_MASK_CACHE)))
    _MASK_CACHE[ck] = (dictionary, mask)
    return mask


def _device_like_mask_uncached(dictionary: np.ndarray, pattern: str,
                               case_insensitive: bool = False):
    try:
        pattern.encode("ascii")
    except UnicodeEncodeError:
        return None
    b2d, lens, ascii_only, exact = _planes(dictionary)
    if not exact:
        return None  # embedded NULs: plane bytes/lengths are truncated
    segments, a_start, a_end = _tokenize(pattern)
    has_underscore = any(w for seg in segments for _, w in seg)
    if not ascii_only and (has_underscore or case_insensitive):
        return None  # `_` counts characters, folding is per-codepoint
    import jax
    import jax.numpy as jnp

    d, lpad = b2d.shape
    mmax = max((len(s) for s in segments), default=0)
    if mmax > lpad:
        with jax.ensure_compile_time_eval():
            return jnp.zeros((d,), jnp.bool_)

    @jax.jit
    def run(b2d, lens):
        b = _fold(b2d) if case_insensitive else b2d
        # pad so every window slice [p : p+m] is in bounds for p < lpad
        bp = jnp.pad(b, ((0, 0), (0, mmax)))
        pos = jnp.arange(lpad, dtype=jnp.int32)[None, :]

        def seg_matrix(seg):
            m = jnp.ones((d, lpad), jnp.bool_)
            for j, (byte, wild) in enumerate(seg):
                if wild:
                    continue
                cb = np.uint8(byte + 32) if (
                    case_insensitive and 65 <= byte <= 90) else np.uint8(byte)
                m = m & (bp[:, j:j + lpad] == cb)
            # window must lie inside the string
            return m & (pos + len(seg) <= lens[:, None])

        ok = jnp.ones((d,), jnp.bool_)
        cur = jnp.zeros((d,), jnp.int32)
        for si, seg in enumerate(segments):
            m = len(seg)
            first, last = si == 0, si == len(segments) - 1
            if m == 0:
                if first and last and a_start and a_end:
                    ok = ok & (lens == 0)  # pattern '' matches only ''
                continue
            mat = seg_matrix(seg)
            if first and a_start and last and a_end:
                ok = ok & mat[:, 0] & (lens == m)
            elif first and a_start:
                ok = ok & mat[:, 0]
                cur = jnp.full((d,), m, jnp.int32)
            elif last and a_end:
                p = jnp.maximum(lens - m, 0)
                hit = jnp.take_along_axis(mat, p[:, None], axis=1)[:, 0]
                ok = ok & hit & (lens - m >= cur)
            else:
                allowed = mat & (pos >= cur[:, None])
                found = jnp.any(allowed, axis=1)
                p = jnp.argmax(allowed, axis=1).astype(jnp.int32)
                ok = ok & found
                cur = p + m
        return ok

    with jax.ensure_compile_time_eval():
        return run(b2d, lens)


def device_length(dictionary: np.ndarray):
    """Per-entry CHARACTER length on device (byte length when ascii)."""
    b2d, lens, ascii_only, exact = _planes(dictionary)
    if ascii_only and exact:
        return lens
    import jax
    import jax.numpy as jnp

    # utf-8 continuation bytes (0b10xxxxxx) don't start a codepoint
    with jax.ensure_compile_time_eval():
        cont = (b2d & 0xC0) == 0x80
        return lens - jnp.sum(cont.astype(jnp.int32), axis=1)
