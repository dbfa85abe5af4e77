"""PAK archive reader (COM_FOpenFile harness, common.c:1553)."""

import numpy as np
import pytest

from blinky_tpu.io.pak import (
    load_palette_from_pak, read_pak_directory, read_pak_entry, write_pak,
)
from blinky_tpu.palette import default_palette


def test_pak_roundtrip(tmp_path):
    pal = default_palette()
    files = {
        "gfx/palette.lmp": pal.tobytes(),
        "maps/e1m1.bsp": b"\x01\x02\x03" * 100,
        "sound/misc/menu1.wav": b"RIFFdata",
    }
    pak = tmp_path / "pak0.pak"
    write_pak(pak, files)
    d = read_pak_directory(pak.read_bytes())
    assert set(d) == set(files)
    for name, blob in files.items():
        assert read_pak_entry(pak, name) == blob
    np.testing.assert_array_equal(load_palette_from_pak(pak), pal)


def test_pak_errors(tmp_path):
    pak = tmp_path / "bad.pak"
    pak.write_bytes(b"JUNK" + b"\x00" * 8)
    with pytest.raises(ValueError):
        read_pak_entry(pak, "x")
    write_pak(tmp_path / "ok.pak", {"a": b"1"})
    with pytest.raises(KeyError):
        read_pak_entry(tmp_path / "ok.pak", "missing")


def test_pak_corrupt_directory_bounds(tmp_path):
    import struct

    # directory offset/length pointing past the buffer must raise the
    # module's ValueError contract, not a struct.error
    data = struct.pack("<4sii", b"PACK", 10_000, 64)
    with pytest.raises(ValueError, match="corrupt PAK"):
        read_pak_directory(data)
    data = struct.pack("<4sii", b"PACK", -4, 64)
    with pytest.raises(ValueError, match="corrupt PAK"):
        read_pak_directory(data)


def test_pak_negative_entry_bounds(tmp_path):
    """Review (late r3): a directory entry with a NEGATIVE offset/size
    must raise ValueError — a Python slice from a negative offset would
    silently return bytes from the END of the file."""
    import struct

    import pytest

    body = b"PAYLOADBYTES"
    # one 64-byte entry with off=-100, size=50
    entry = struct.pack("<56sii", b"gfx/palette.lmp", -100, 50)
    header = struct.pack("<4sii", b"PACK", len(b"PACK\x00" * 0) + 12 + len(body), 64)
    data = b"PACK" + struct.pack("<ii", 12 + len(body), 64) + body + entry
    pak = tmp_path / "neg.pak"
    pak.write_bytes(data)
    with pytest.raises(ValueError):
        read_pak_directory(pak.read_bytes())
