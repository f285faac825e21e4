"""Dependency-free media container parsing (X5 de-stub).

Real decoding of the *container* layer — magic bytes, dimensions,
audio duration — implemented from the public file-format specs (PNG
ISO 15948 §5.3/11.2.2, JPEG ITU-T.81 §B.2.2, GIF89a spec §17-18,
BMP BITMAPINFOHEADER, RIFF/WAVE, FLAC STREAMINFO, MPEG-1 Layer III
frame headers incl. ID3v2 skip). No Pillow/soundfile needed: these
are fixed-offset/segment-walk header reads, so an Arrow batch of
payloads is sniffed at memory-bandwidth speed and only the pixel /
sample *content* decode stays behind the library stub
(multimodal.decode_media).

Builders for each format emit minimal-but-valid files so tests and
oracle queries can round-trip real bytes, not fakes.
"""

from __future__ import annotations

import struct

# ---------------------------------------------------------------------------
# Sniffers: bytes -> dict(format, width, height, duration_ms, ...)
# ---------------------------------------------------------------------------

_UNKNOWN = {
    "format": None,
    "width": None,
    "height": None,
    "duration_ms": None,
    "sample_rate": None,
    "channels": None,
}


def _sniff_png(data: bytes) -> dict | None:
    # 8-byte signature, then IHDR must be the first chunk:
    # len(4) 'IHDR' width(u32be) height(u32be) at offsets 8..24.
    if len(data) < 24 or data[:8] != b"\x89PNG\r\n\x1a\n" or data[12:16] != b"IHDR":
        return None
    w, h = struct.unpack(">II", data[16:24])
    return {**_UNKNOWN, "format": "png", "width": w, "height": h}


def _sniff_gif(data: bytes) -> dict | None:
    if len(data) < 10 or data[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    w, h = struct.unpack("<HH", data[6:10])
    return {**_UNKNOWN, "format": "gif", "width": w, "height": h}


def _sniff_bmp(data: bytes) -> dict | None:
    # BITMAPFILEHEADER (14 bytes) + BITMAPINFOHEADER: width i32le @18,
    # height i32le @22 (negative height = top-down rows).
    if len(data) < 26 or data[:2] != b"BM":
        return None
    w, h = struct.unpack("<ii", data[18:26])
    return {**_UNKNOWN, "format": "bmp", "width": w, "height": abs(h)}


def _sniff_jpeg(data: bytes) -> dict | None:
    # Walk marker segments until a start-of-frame (SOFn) carrying the
    # sample dimensions: FF C0-CF excluding C4 (DHT), C8 (JPG), CC (DAC).
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        return None
    i = 2
    while i + 4 <= len(data):
        if data[i] != 0xFF:
            return None  # desynced — corrupt stream
        marker = data[i + 1]
        if marker == 0xD9:  # EOI before any SOF
            break
        if marker in (0x01, *range(0xD0, 0xD8)):  # standalone markers
            i += 2
            continue
        seglen = struct.unpack(">H", data[i + 2 : i + 4])[0]
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if i + 9 > len(data):
                return None
            h, w = struct.unpack(">HH", data[i + 5 : i + 9])
            return {**_UNKNOWN, "format": "jpeg", "width": w, "height": h}
        i += 2 + seglen
    return None


def _sniff_wav(data: bytes) -> dict | None:
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    # Chunk walk: each chunk is id(4) size(u32le) payload(size, padded
    # to even). Need fmt (byte rate) and data (payload size) chunks.
    i = 12
    byte_rate = sample_rate = channels = None
    data_size = None
    while i + 8 <= len(data):
        cid = data[i : i + 4]
        size = struct.unpack("<I", data[i + 4 : i + 8])[0]
        if cid == b"fmt " and i + 24 <= len(data):
            channels, sample_rate, byte_rate = struct.unpack(
                "<HII", data[i + 10 : i + 20]
            )
        elif cid == b"data":
            data_size = size
        i += 8 + size + (size & 1)
    if byte_rate in (None, 0) or data_size is None:
        return None
    return {
        **_UNKNOWN,
        "format": "wav",
        "duration_ms": data_size * 1000 // byte_rate,
        "sample_rate": sample_rate,
        "channels": channels,
    }


def _sniff_flac(data: bytes) -> dict | None:
    # 'fLaC' magic, then metadata blocks: 1-byte (last<<7 | type) +
    # be24 length. STREAMINFO (type 0) must come first; its body packs
    # sample_rate(20) channels-1(3) bps-1(5) total_samples(36) as one
    # big-endian 64-bit field at body offsets 10..18.
    if len(data) < 8 + 34 or data[:4] != b"fLaC" or (data[4] & 0x7F) != 0:
        return None
    body = data[8 : 8 + 34]
    u = int.from_bytes(body[10:18], "big")
    sr = u >> 44
    if sr == 0:
        return None
    channels = ((u >> 41) & 0x7) + 1
    total = u & ((1 << 36) - 1)
    return {
        **_UNKNOWN,
        "format": "flac",
        "duration_ms": total * 1000 // sr,
        "sample_rate": sr,
        "channels": channels,
    }


# MPEG-1 Layer III tables (ISO 11172-3): bitrate kbps by index, sample
# rate by index. Index 0 ("free") and 15 are invalid for our purposes.
_MP3_BITRATES = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
_MP3_RATES = (44100, 48000, 32000)


def _sniff_mp3(data: bytes) -> dict | None:
    # Optional ID3v2 prefix: 'ID3' ver(2) flags(1) syncsafe size(4).
    off = 0
    if data[:3] == b"ID3" and len(data) >= 10:
        size = 0
        for b in data[6:10]:
            size = (size << 7) | (b & 0x7F)
        off = 10 + size
    if len(data) < off + 4:
        return None
    h = int.from_bytes(data[off : off + 4], "big")
    # sync(11)=all ones, version(2)=11 (MPEG-1), layer(2)=01 (III)
    if (h >> 21) != 0x7FF or ((h >> 19) & 3) != 3 or ((h >> 17) & 3) != 1:
        return None
    br_idx = (h >> 12) & 0xF
    sr_idx = (h >> 10) & 3
    if br_idx in (0, 15) or sr_idx == 3:
        return None
    bitrate = _MP3_BITRATES[br_idx]
    mode = (h >> 6) & 3
    # CBR estimate over the audio bytes: ms = bytes·8 / kbps
    return {
        **_UNKNOWN,
        "format": "mp3",
        "duration_ms": (len(data) - off) * 8 // bitrate,
        "sample_rate": _MP3_RATES[sr_idx],
        "channels": 1 if mode == 3 else 2,
    }


_SNIFFERS = (
    _sniff_png,
    _sniff_jpeg,
    _sniff_gif,
    _sniff_bmp,
    _sniff_wav,
    _sniff_flac,
    _sniff_mp3,
)


def sniff_header(data: bytes | None) -> dict:
    """Identify the container and extract real header metadata.

    Returns the _UNKNOWN dict (format=None) for unrecognized or
    truncated payloads instead of raising — at 100 TB a poison payload
    must dead-letter a row, not fail a stage.
    """
    if not data:
        return dict(_UNKNOWN)
    for sniff in _SNIFFERS:
        out = sniff(data)
        if out is not None:
            return out
    return dict(_UNKNOWN)


# ---------------------------------------------------------------------------
# Builders: minimal valid files (test fixtures / oracle round-trips)
# ---------------------------------------------------------------------------


def build_png(width: int, height: int) -> bytes:
    ihdr = struct.pack(">II", width, height) + b"\x08\x06\x00\x00\x00"
    # zero CRCs are fine for header parsing; IEND closes the stream
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13) + b"IHDR" + ihdr + b"\x00\x00\x00\x00"
        + struct.pack(">I", 0) + b"IEND" + b"\x00\x00\x00\x00"
    )


def build_gif(width: int, height: int) -> bytes:
    return b"GIF89a" + struct.pack("<HH", width, height) + b"\x00\x00\x00\x3b"


def build_bmp(width: int, height: int) -> bytes:
    header = b"BM" + struct.pack("<IHHI", 54, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, 0, 0, 0, 0, 0)
    return header + info


def build_jpeg(width: int, height: int) -> bytes:
    sof0 = b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, height, width, 1) + b"\x01\x11\x00"
    return b"\xff\xd8" + sof0 + b"\xff\xd9"


def build_wav(duration_ms: int, sample_rate: int = 8000, channels: int = 1) -> bytes:
    bits = 8
    byte_rate = sample_rate * channels * bits // 8
    data_size = duration_ms * byte_rate // 1000
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate,
                      channels * bits // 8, bits)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", data_size) + b"\x80" * data_size
    return b"RIFF" + struct.pack("<I", len(body)) + body


def build_flac(total_samples: int, sample_rate: int = 16000, channels: int = 1) -> bytes:
    """Minimal valid FLAC: magic + last-flag STREAMINFO with the real
    packed rate/channels/bps/total-samples field (zero min/max block
    and frame sizes, zero md5 — legal and irrelevant to sniffing)."""
    u = (
        (sample_rate << 44)
        | ((channels - 1) << 41)
        | ((16 - 1) << 36)
        | (total_samples & ((1 << 36) - 1))
    )
    body = b"\x00" * 10 + u.to_bytes(8, "big") + b"\x00" * 16
    return b"fLaC" + bytes([0x80]) + len(body).to_bytes(3, "big") + body


def build_mp3(
    n_frames: int, bitrate_kbps: int = 128, sample_rate: int = 44100,
    channels: int = 2,
) -> bytes:
    """Minimal CBR MPEG-1 Layer III stream: n identical zero-payload
    frames (header sync/version/layer/bitrate/rate/mode all real)."""
    br_idx = _MP3_BITRATES.index(bitrate_kbps)
    sr_idx = _MP3_RATES.index(sample_rate)
    mode = 3 if channels == 1 else 0
    h = (
        (0x7FF << 21) | (3 << 19) | (1 << 17) | (1 << 16)  # sync, MPEG-1, L3, no CRC
        | (br_idx << 12) | (sr_idx << 10) | (mode << 6)
    )
    frame_len = 144 * bitrate_kbps * 1000 // sample_rate
    frame = h.to_bytes(4, "big") + b"\x00" * (frame_len - 4)
    return frame * n_frames
