"""Byte-level tests for the standard Delta deletion-vector codec
(sources/roaring.py): RoaringFormatSpec portable 32-bit bitmaps, Delta's
64-bit RoaringBitmapArray framing, the DV file layout, and Z85 paths.  No
SparkSession needed — pure codec."""

import struct
import uuid
import zlib

from hypothesis import given, settings
from hypothesis import strategies as st

from delta_sorter_spark.sources.roaring import (
    DV_FILE_VERSION,
    MAGIC_NUMBER,
    decode_dv_entry,
    deserialize_roaring_array,
    dv_uuid_path,
    encode_dv_file,
    make_dv_descriptor,
    positions_from_descriptor,
    serialize_roaring_array,
    z85_decode,
    z85_encode,
)


def test_z85_spec_vector():
    # the reference vector from the ZeroMQ Z85 RFC
    assert z85_encode(bytes.fromhex("864FD26FB559F75B")) == "HelloWorld"
    assert z85_decode("HelloWorld") == bytes.fromhex("864FD26FB559F75B")


def test_rb32_hand_derived_bytes():
    """[0,1,2] -> one array container; every byte position pinned against
    the RoaringFormatSpec by hand (cookie 12346, count, descriptive header,
    offset header, payload), wrapped in the Delta magic + bitmap count."""
    data = serialize_roaring_array([0, 1, 2])
    exp32 = bytes.fromhex(
        "3a30000001000000"  # cookie 12346 LE, 1 container
        "00000200"          # key 0, cardinality-1 = 2
        "10000000"          # offset of container payload = 16
        "000001000200"      # uint16 values 0,1,2
    )
    assert data == (
        MAGIC_NUMBER.to_bytes(4, "little") + (1).to_bytes(8, "little") + exp32
    )


def test_bitmap_container_threshold():
    """>4096 values in one 16-bit chunk switches to an 8 KiB bitmap
    container; round-trip stays exact across the boundary."""
    vals = list(range(5000))
    data = serialize_roaring_array(vals)
    assert len(data) >= 8192
    assert deserialize_roaring_array(data) == vals


def test_run_container_read_compat():
    """Foreign writers may emit run containers (cookie 12347); the reader
    must parse them.  Build one by hand: values 5..12 as a single run."""
    n = 1
    payload = (
        struct.pack("<HH", 12347, n - 1)
        + bytes([0b1])               # run flag for container 0
        + struct.pack("<HH", 0, 7)   # key 0, cardinality-1 (8 values)
        + struct.pack("<H", 1)       # 1 run
        + struct.pack("<HH", 5, 7)   # start 5, length-1 = 7
    )
    data = MAGIC_NUMBER.to_bytes(4, "little") + (1).to_bytes(8, "little") + payload
    assert deserialize_roaring_array(data) == list(range(5, 13))


def test_multi_bitmap_64bit_positions():
    vals = [7, 2**32, 2**32 + 65536, 2**33 + 1]
    assert deserialize_roaring_array(serialize_roaring_array(vals)) == sorted(vals)


def test_dv_file_framing_and_checksum():
    rb = serialize_roaring_array([3, 9])
    fbytes, spans = encode_dv_file([rb])
    assert fbytes[0] == DV_FILE_VERSION and spans == [(1, len(rb))]
    assert decode_dv_entry(fbytes, 1) == rb
    # corrupt a payload byte -> checksum failure
    bad = bytearray(fbytes)
    bad[6] ^= 0xFF
    try:
        decode_dv_entry(bytes(bad), 1)
        raise AssertionError("corrupted entry must fail the CRC check")
    except ValueError:
        pass
    # multi-entry packing: offsets line up
    fbytes2, spans2 = encode_dv_file([rb, rb])
    for off, size in spans2:
        assert decode_dv_entry(fbytes2, off) == rb
        (got_size,) = struct.unpack_from(">i", fbytes2, off)
        assert got_size == size == len(rb)
        (crc,) = struct.unpack_from(">I", fbytes2, off + 4 + size)
        assert crc == zlib.crc32(rb) & 0xFFFFFFFF


def test_descriptor_paths_and_inline():
    u = uuid.uuid4()
    rb = serialize_roaring_array([1])
    d = make_dv_descriptor(u.bytes, 1, len(rb), 1)
    assert d["storageType"] == "u" and len(d["pathOrInlineDv"]) == 20
    assert dv_uuid_path(d["pathOrInlineDv"]) == f"deletion_vector_{u}.bin"
    d2 = make_dv_descriptor(u.bytes, 1, len(rb), 1, prefix="ab")
    assert dv_uuid_path(d2["pathOrInlineDv"]) == f"ab/deletion_vector_{u}.bin"
    # inline vectors need no file IO at all
    inline = {
        "storageType": "i",
        "pathOrInlineDv": z85_encode(rb + b"\0" * ((-len(rb)) % 4)),
        "offset": None,
        "sizeInBytes": len(rb),
        "cardinality": 1,
    }
    # (padding bytes past the serialized array are ignored by the parser)
    assert positions_from_descriptor(inline, None) == [1]


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=2**33), max_size=400, unique=True
    )
)
def test_roundtrip_property(vals):
    assert deserialize_roaring_array(serialize_roaring_array(vals)) == sorted(vals)
