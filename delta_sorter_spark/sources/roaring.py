"""Standard Delta-protocol deletion-vector encoding, pure Python.

Implements the on-disk format the public Delta PROTOCOL.md specifies for
deletion vectors (the format delta-rs — the reference's own table layer,
crates/sorter-core/Cargo.toml:15 ``deltalake 0.28`` — and delta-spark read),
replacing this engine's earlier parquet-sidecar divergence:

- **Bitmap**: a 64-bit RoaringBitmapArray in its "portable" serialization —
  4-byte little-endian magic ``1681511377``, an 8-byte little-endian count
  of 32-bit bitmaps, then each 32-bit bitmap (dense, implicit high-word
  keys) in the standard RoaringFormatSpec portable layout (cookie 12346/
  12347, descriptive + offset headers, array/bitmap/run containers).
- **DV file**: a 1-byte format version (``1``), then per stored vector a
  4-byte BIG-endian length, the bitmap bytes, and a 4-byte big-endian
  CRC-32 of those bytes (Java ``DataOutputStream`` framing).  The
  ``deletionVector.offset`` in the Add action points at the length field;
  ``sizeInBytes`` is the bitmap byte count (magic included).
- **Path encoding**: storageType ``"u"`` stores ``<prefix><z85-uuid>``
  where the final 20 characters are the Z85 (ZeroMQ alphabet) encoding of
  the 16 UUID bytes; the file lives at
  ``<table>/<prefix>/deletion_vector_<uuid>.bin``.  ``"i"`` inlines the
  bitmap bytes themselves as Z85; ``"p"`` is an absolute path.

Row indexes in a single parquet file are far below 2**32, so real vectors
serialize as exactly one 32-bit bitmap; the codec nevertheless round-trips
arbitrary 64-bit positions (dense keys, matching RoaringBitmapArray's
portable layout).
"""

from __future__ import annotations

import struct
import uuid as _uuid
import zlib

MAGIC_NUMBER = 1681511377
SERIAL_COOKIE_NO_RUNCONTAINER = 12346
SERIAL_COOKIE = 12347  # with run containers
NO_OFFSET_THRESHOLD = 4
ARRAY_CONTAINER_MAX = 4096
DV_FILE_VERSION = 1

_Z85_ALPHABET = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_DECODE = {c: i for i, c in enumerate(_Z85_ALPHABET)}


def z85_encode(data: bytes) -> str:
    """ZeroMQ Z85: 4 bytes -> 5 chars, big-endian groups, no padding."""
    if len(data) % 4:
        raise ValueError(f"z85 input must be a multiple of 4 bytes, got {len(data)}")
    out = []
    for i in range(0, len(data), 4):
        v = int.from_bytes(data[i : i + 4], "big")
        chunk = []
        for _ in range(5):
            chunk.append(_Z85_ALPHABET[v % 85])
            v //= 85
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise ValueError(f"z85 input must be a multiple of 5 chars, got {len(text)}")
    out = bytearray()
    for i in range(0, len(text), 5):
        v = 0
        for c in text[i : i + 5]:
            v = v * 85 + _Z85_DECODE[c]
        out += v.to_bytes(4, "big")
    return bytes(out)


# ---------------------------------------------------------------------------
# 32-bit RoaringBitmap, portable format (RoaringFormatSpec)
# ---------------------------------------------------------------------------


def _serialize_rb32(values) -> bytes:
    """``values``: sorted, distinct ints in [0, 2**32).  Always writes the
    no-run-container layout (cookie 12346) — simplest valid encoding; any
    spec-conforming reader accepts it."""
    containers: list[tuple[int, list[int]]] = []  # (key, low 16-bit values)
    cur_key, cur_vals = None, []
    for v in values:
        key, low = v >> 16, v & 0xFFFF
        if key != cur_key:
            if cur_vals:
                containers.append((cur_key, cur_vals))
            cur_key, cur_vals = key, []
        cur_vals.append(low)
    if cur_vals:
        containers.append((cur_key, cur_vals))

    n = len(containers)
    head = struct.pack("<II", SERIAL_COOKIE_NO_RUNCONTAINER, n)
    desc = b"".join(
        struct.pack("<HH", key, len(vals) - 1) for key, vals in containers
    )
    bodies = []
    for _key, vals in containers:
        if len(vals) <= ARRAY_CONTAINER_MAX:
            bodies.append(struct.pack(f"<{len(vals)}H", *vals))
        else:
            bits = bytearray(8192)
            for lv in vals:
                bits[lv >> 3] |= 1 << (lv & 7)
            bodies.append(bytes(bits))
    # offset header: absolute byte offset of each container from stream start
    base = len(head) + len(desc) + 4 * n
    offsets, pos = [], base
    for b in bodies:
        offsets.append(pos)
        pos += len(b)
    off = struct.pack(f"<{n}I", *offsets) if n else b""
    return head + desc + off + b"".join(bodies)


def _deserialize_rb32(buf: bytes, pos: int) -> tuple[list[int], int]:
    """Parse one 32-bit bitmap starting at ``pos``; returns (values, end)."""
    (cookie16,) = struct.unpack_from("<H", buf, pos)
    run_flags = None
    if cookie16 == SERIAL_COOKIE:  # run containers present
        (n_minus1,) = struct.unpack_from("<H", buf, pos + 2)
        n = n_minus1 + 1
        pos += 4
        n_flag_bytes = (n + 7) // 8
        run_flags = buf[pos : pos + n_flag_bytes]
        pos += n_flag_bytes
        has_offsets = n >= NO_OFFSET_THRESHOLD
    else:
        cookie, n = struct.unpack_from("<II", buf, pos)
        if cookie != SERIAL_COOKIE_NO_RUNCONTAINER:
            raise ValueError(f"not a portable RoaringBitmap (cookie {cookie})")
        pos += 8
        has_offsets = True
    keys_cards = []
    for i in range(n):
        key, card_minus1 = struct.unpack_from("<HH", buf, pos)
        keys_cards.append((key, card_minus1 + 1))
        pos += 4
    if has_offsets:
        pos += 4 * n  # offsets are redundant for sequential parsing
    values: list[int] = []
    for i, (key, card) in enumerate(keys_cards):
        base = key << 16
        is_run = run_flags is not None and (run_flags[i >> 3] >> (i & 7)) & 1
        if is_run:
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            for _ in range(n_runs):
                start, length_minus1 = struct.unpack_from("<HH", buf, pos)
                pos += 4
                values.extend(base + start + j for j in range(length_minus1 + 1))
        elif card <= ARRAY_CONTAINER_MAX:
            vals = struct.unpack_from(f"<{card}H", buf, pos)
            pos += 2 * card
            values.extend(base + v for v in vals)
        else:
            bits = buf[pos : pos + 8192]
            pos += 8192
            for byte_i, byte in enumerate(bits):
                if byte:
                    for bit in range(8):
                        if byte >> bit & 1:
                            values.append(base + (byte_i << 3) + bit)
    return values, pos


# ---------------------------------------------------------------------------
# 64-bit RoaringBitmapArray (Delta's flavor), portable format
# ---------------------------------------------------------------------------


def serialize_roaring_array(positions) -> bytes:
    """Sorted/distinct-ified 64-bit positions -> Delta portable bitmap bytes
    (magic + bitmap count + dense 32-bit bitmaps)."""
    positions = sorted(set(int(p) for p in positions))
    if positions and positions[0] < 0:
        raise ValueError("positions must be non-negative")
    by_high: dict[int, list[int]] = {}
    for p in positions:
        by_high.setdefault(p >> 32, []).append(p & 0xFFFFFFFF)
    n_bitmaps = (max(by_high) + 1) if by_high else 0
    out = [struct.pack("<iq", MAGIC_NUMBER, n_bitmaps)]
    for high in range(n_bitmaps):
        out.append(_serialize_rb32(by_high.get(high, [])))
    return b"".join(out)


def deserialize_roaring_array(data: bytes) -> list[int]:
    magic, n_bitmaps = struct.unpack_from("<iq", data, 0)
    if magic != MAGIC_NUMBER:
        raise ValueError(f"bad RoaringBitmapArray magic {magic}")
    pos, values = 12, []
    for high in range(n_bitmaps):
        vals, pos = _deserialize_rb32(data, pos)
        values.extend((high << 32) | v for v in vals)
    return values


# ---------------------------------------------------------------------------
# DV file framing + Add-action struct helpers
# ---------------------------------------------------------------------------


def encode_dv_file(bitmaps: list[bytes]) -> tuple[bytes, list[tuple[int, int]]]:
    """Pack serialized bitmaps into one DV file.  Returns (file bytes,
    [(offset, sizeInBytes) per bitmap]) — offset points at the 4-byte
    big-endian length field, per the protocol."""
    parts = [bytes([DV_FILE_VERSION])]
    spans, pos = [], 1
    for data in bitmaps:
        spans.append((pos, len(data)))
        parts.append(struct.pack(">i", len(data)))
        parts.append(data)
        parts.append(struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF))
        pos += 4 + len(data) + 4
    return b"".join(parts), spans


def decode_dv_entry(file_bytes: bytes, offset: int, verify: bool = True) -> bytes:
    """Extract one bitmap's bytes from a DV file at ``offset``."""
    (size,) = struct.unpack_from(">i", file_bytes, offset)
    data = file_bytes[offset + 4 : offset + 4 + size]
    if len(data) != size:
        raise ValueError("truncated deletion-vector entry")
    if verify:
        (crc,) = struct.unpack_from(">I", file_bytes, offset + 4 + size)
        if (crc & 0xFFFFFFFF) != (zlib.crc32(data) & 0xFFFFFFFF):
            raise ValueError("deletion-vector checksum mismatch")
    return data


def dv_uuid_path(path_or_inline: str) -> str:
    """storageType "u": ``<prefix><20-char z85 uuid>`` -> the table-relative
    DV file path ``<prefix>/deletion_vector_<uuid>.bin``."""
    prefix, enc = path_or_inline[:-20], path_or_inline[-20:]
    u = _uuid.UUID(bytes=z85_decode(enc))
    name = f"deletion_vector_{u}.bin"
    return f"{prefix}/{name}" if prefix else name


def make_dv_descriptor(
    uuid_bytes: bytes, offset: int, size_in_bytes: int, cardinality: int,
    prefix: str = "",
) -> dict:
    """Protocol-shaped ``deletionVector`` struct for an Add action."""
    return {
        "storageType": "u",
        "pathOrInlineDv": prefix + z85_encode(uuid_bytes),
        "offset": offset,
        "sizeInBytes": size_in_bytes,
        "cardinality": cardinality,
    }


def positions_from_descriptor(dv: dict, read_bytes) -> list[int]:
    """Decode deleted positions from a protocol-shaped descriptor.
    ``read_bytes(table_relative_or_absolute_path) -> bytes`` supplies file
    IO (local or object store)."""
    st = dv.get("storageType")
    if st == "i":
        data = z85_decode(dv["pathOrInlineDv"])
        return deserialize_roaring_array(data)
    if st == "u":
        rel = dv_uuid_path(dv["pathOrInlineDv"])
    elif st == "p":
        rel = dv["pathOrInlineDv"]
    else:
        raise ValueError(f"unknown deletion vector storageType {st!r}")
    file_bytes = read_bytes(rel)
    offset = dv.get("offset") or 0
    if offset == 0 and file_bytes[:1] == bytes([DV_FILE_VERSION]):
        offset = 1  # defensive: offset omitted but file is framed
    data = decode_dv_entry(file_bytes, offset)
    return deserialize_roaring_array(data)
