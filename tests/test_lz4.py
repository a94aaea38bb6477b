"""Pure-Python LZ4 frame codec (io/lz4f.py) — the roslz4 chunk format.

Golden byte sequences are hand-derived from the public LZ4 block/frame
specs (not round-tripped through our own code), so they pin the wire
format, not just self-consistency.
"""

import struct

import numpy as np
import pytest

from fiesta_tpu.io import lz4f


# --- xxHash32 (known public test vectors) ----------------------------------


def test_xxh32_vectors():
    assert lz4f.xxh32(b"") == 0x02CC5D05
    assert lz4f.xxh32(b"a") == 0x550D7456
    assert lz4f.xxh32(b"abc") == 0x32D153FF
    # >16 bytes exercises the 4-lane bulk loop
    assert lz4f.xxh32(b"a" * 101, seed=0) != lz4f.xxh32(b"a" * 100, seed=0)


# --- block format: hand-crafted golden sequences ---------------------------


def test_block_decode_literals_only():
    # token 0x50: 5 literals, no match (final sequence)
    assert lz4f.decompress_block(b"\x50hello") == b"hello"


def test_block_decode_with_match():
    # 10 literals "0123456789", match offset 10 len 10 (token low nibble
    # 6 = 10-4), then final 5 literals "ABCDE"
    blk = b"\xa6" + b"0123456789" + struct.pack("<H", 10) + b"\x50ABCDE"
    assert lz4f.decompress_block(blk) == b"0123456789" * 2 + b"ABCDE"


def test_block_decode_overlap_rle():
    # 1 literal "x", match offset 1 length 19 (15 in token + ext 0 + 4):
    # classic RLE via self-overlapping copy
    blk = b"\x1fx" + struct.pack("<H", 1) + b"\x00" + b"\x50ABCDE"
    assert lz4f.decompress_block(blk) == b"x" * 20 + b"ABCDE"


def test_block_decode_length_extension():
    # 20 literals: token 0xF0 + extension byte 5
    lit = bytes(range(20))
    blk = b"\xf0\x05" + lit
    assert lz4f.decompress_block(blk) == lit


def test_block_decode_corrupt():
    with pytest.raises(lz4f.LZ4Error):
        lz4f.decompress_block(b"\x50hi")        # literal run past end
    with pytest.raises(lz4f.LZ4Error):
        # match offset beyond start
        lz4f.decompress_block(b"\x14" + b"a" + struct.pack("<H", 9)
                              + b"\x10b")


# --- compressor round trips -------------------------------------------------


@pytest.mark.parametrize("data", [
    b"",
    b"x",
    b"short",
    b"twelve bytes",
    b"a" * 10_000,                                   # RLE / overlap matches
    bytes(range(256)) * 64,                          # periodic
    np.random.default_rng(0).bytes(50_000),          # incompressible
    (b"the quick brown fox jumps over the lazy dog " * 500),
])
def test_block_roundtrip(data):
    comp = lz4f.compress_block(data)
    assert lz4f.decompress_block(comp) == data


def test_block_compression_ratio():
    data = b"abcd" * 25_000
    comp = lz4f.compress_block(data)
    assert len(comp) < len(data) // 50  # highly repetitive -> tiny


# --- frame format ------------------------------------------------------------


@pytest.mark.parametrize("data", [
    b"",
    b"hello world",
    b"z" * (3 << 20),          # multiple 1 MB blocks
    np.random.default_rng(1).bytes(100_000),
])
def test_frame_roundtrip(data):
    frame = lz4f.compress_frame(data)
    assert lz4f.decompress_frame(frame) == data


def test_frame_magic_and_header_layout():
    frame = lz4f.compress_frame(b"payload")
    (magic,) = struct.unpack_from("<I", frame, 0)
    assert magic == 0x184D2204
    flg = frame[4]
    assert flg >> 6 == 1                      # version 01
    assert flg & (1 << 2)                     # content checksum present
    # header checksum byte is xxh32(FLG+BD) >> 8 & 0xFF (spec)
    assert frame[6] == (lz4f.xxh32(frame[4:6]) >> 8) & 0xFF


def test_frame_detects_corruption():
    frame = bytearray(lz4f.compress_frame(b"some payload bytes here"))
    frame[-1] ^= 0xFF                         # content checksum
    with pytest.raises(lz4f.LZ4Error, match="content checksum"):
        lz4f.decompress_frame(bytes(frame))

    frame2 = bytearray(lz4f.compress_frame(b"other data"))
    frame2[4] ^= 0x04                         # flip a FLG bit
    with pytest.raises(lz4f.LZ4Error, match="header checksum"):
        lz4f.decompress_frame(bytes(frame2))

    with pytest.raises(lz4f.LZ4Error, match="magic"):
        lz4f.decompress_frame(b"\x00\x00\x00\x00rest")


def test_frame_uncompressed_block_path():
    """Incompressible data is stored raw (high-bit block size) and decodes."""
    data = np.random.default_rng(2).bytes(5000)
    frame = lz4f.compress_frame(data)
    (bsz,) = struct.unpack_from("<I", frame, 7)
    assert bsz & 0x80000000                   # raw block flag
    assert lz4f.decompress_frame(frame) == data


def test_truncated_frames_raise_lz4error():
    """Truncated frames fail with LZ4Error, never raw IndexError."""
    # header with content-size flag set, cut mid-header
    trunc = struct.pack("<I", 0x184D2204) + bytes([0x48, 0x40])
    with pytest.raises(lz4f.LZ4Error):
        lz4f.decompress_frame(trunc)
    # valid frame cut right after the first block size word
    frame = lz4f.compress_frame(b"some payload")
    with pytest.raises(lz4f.LZ4Error):
        lz4f.decompress_frame(frame[:12])


def test_empty_frame_has_no_data_blocks():
    """compress_frame(b'') emits just EndMark (+checksum): a zero-length
    data block would collide with EndMark's encoding."""
    frame = lz4f.compress_frame(b"")
    (first_word,) = struct.unpack_from("<I", frame, 7)
    assert first_word == 0          # EndMark immediately
    assert lz4f.decompress_frame(frame) == b""


# --- linked-block frames (FLG bit 5 clear) ----------------------------------


def test_block_decode_with_prefix_history():
    """Matches may reach back into the caller-supplied history window."""
    hist = b"0123456789ABCDEF"
    # 0 literals, match len 10 (token 0x06), offset 16 -> starts at hist[0];
    # then final 5 literals
    blk = b"\x06" + struct.pack("<H", 16) + b"\x50WORLD"
    assert lz4f.decompress_block(blk, prefix=hist) == b"0123456789WORLD"
    # match crossing from history into this block's own output:
    # 2 literals "xy", then match offset 4 (reaches 2 bytes into hist,
    # then 2 bytes of own output), len 4 (token low nibble 0)
    blk2 = b"\x20xy" + struct.pack("<H", 4) + b"\x50ABCDE"
    assert lz4f.decompress_block(blk2, prefix=hist) == b"xyEFxyABCDE"
    # without history the same block must fail loudly
    with pytest.raises(lz4f.LZ4Error):
        lz4f.decompress_block(blk)


def test_linked_block_frame_decodes():
    """Hand-built conformant linked-block frame (block 2's match references
    block 1's output through the inter-block history window)."""
    flg = 0x40                # version 01, linked blocks, no checksums
    bd = 0x40                 # 64 KiB max block size
    header = bytes([flg, bd])
    hc = (lz4f.xxh32(header) >> 8) & 0xFF
    blk1 = b"\xf0\x01" + b"0123456789ABCDEF"      # 16 literals
    blk2 = b"\x06" + struct.pack("<H", 16) + b"\x50WORLD"
    frame = (struct.pack("<I", lz4f.MAGIC) + header + bytes([hc])
             + struct.pack("<I", len(blk1)) + blk1
             + struct.pack("<I", len(blk2)) + blk2
             + struct.pack("<I", 0))
    assert lz4f.decompress_frame(frame) == \
        b"0123456789ABCDEF" + b"0123456789WORLD"
