"""Image IO: dependency-free PNG reader/writer + asset loaders.

The reference displays to a canvas and loads image/cubemap assets via
the browser (index.js:257-340); the framework's displays are files and
its asset loaders live here.  Row 0 of our internal arrays is the image
*bottom* (gl_FragCoord convention, models/camera.py), so writers flip
vertically; readers destined for *texture* use keep PNG's top-down rows
(texture V runs top-down in the reference's getTexel, raytracer.glsl:
726-772).

PNG decode is pure stdlib (struct + zlib, filters 0-4, color types
0/2/3/4/6, bit depth 8/16).  Non-PNG formats (the reference cubemap is
JPEG) fall back to PIL when present; without PIL, only PNG loads.
"""

from __future__ import annotations

import os
import struct
import zlib

import numpy as np


def to_uint8(img) -> np.ndarray:
    """[0,1] float image -> uint8, flipping to top-down row order."""
    arr = np.asarray(img)
    arr = np.clip(arr, 0.0, 1.0)
    arr = (arr * 255.0 + 0.5).astype(np.uint8)
    return arr[::-1]  # bottom-up -> top-down


def write_png(path: str, img) -> None:
    """Write an [H, W, 3] (or [H, W]) float image in [0,1] as PNG."""
    arr = to_uint8(img)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    h, w, _ = arr.shape

    raw = b"".join(b"\x00" + arr[i].tobytes() for i in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        c = struct.pack(">I", len(data)) + tag + data
        return c + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(raw, 6))
           + chunk(b"IEND", b""))
    with open(path, "wb") as f:
        f.write(png)


def write_npy(path: str, img) -> None:
    np.save(path, np.asarray(img))


# ---------------------------------------------------------------------------
# PNG decoder (stdlib-only)
# ---------------------------------------------------------------------------

def _paeth(a, b, c):
    """Paeth predictor, vectorized over one scanline (PNG spec 9.4)."""
    p = a.astype(np.int32) + b.astype(np.int32) - c.astype(np.int32)
    pa = np.abs(p - a)
    pb = np.abs(p - b)
    pc = np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def read_png(path: str) -> np.ndarray:
    """Decode a PNG to float32 [H, W, C] in [0, 1], top-down row order.

    Supports bit depth 8/16, color types gray(0)/RGB(2)/palette(3)/
    gray+alpha(4)/RGBA(6), non-interlaced.
    """
    with open(path, "rb") as f:
        data = f.read()
    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError(f"{path}: not a PNG")

    pos = 8
    idat = []
    palette = None
    trns = None
    w = h = depth = ctype = interlace = None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype, _, _, interlace = struct.unpack(">IIBBBBB", body)
        elif tag == b"PLTE":
            palette = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif tag == b"tRNS":
            trns = np.frombuffer(body, np.uint8)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError(f"{path}: missing IHDR")
    if interlace:
        raise ValueError(f"{path}: Adam7 interlacing not supported")
    if depth not in (8, 16) and ctype != 3:
        raise ValueError(f"{path}: bit depth {depth} not supported")

    nchan = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    bypp = max(depth // 8, 1) * nchan  # bytes per pixel
    if ctype == 3 and depth not in (1, 2, 4, 8):
        raise ValueError(f"{path}: palette depth {depth} not supported")
    if ctype == 3 and depth != 8:
        raise ValueError(f"{path}: sub-byte palette not supported")

    raw = zlib.decompress(b"".join(idat))
    stride = w * bypp
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    pos = 0
    for row in range(h):
        filt = raw[pos]
        line = np.frombuffer(raw, np.uint8, stride, pos + 1).copy()
        pos += 1 + stride
        if filt == 1:    # Sub
            for i in range(bypp, stride):
                line[i] = (int(line[i]) + int(line[i - bypp])) & 0xFF
        elif filt == 2:  # Up
            line = (line + prev) & 0xFF
        elif filt == 3:  # Average
            line = line.astype(np.int32)
            for i in range(stride):
                left = line[i - bypp] if i >= bypp else 0
                line[i] = (line[i] + ((left + int(prev[i])) >> 1)) & 0xFF
            line = line.astype(np.uint8)
        elif filt == 4:  # Paeth
            line = line.astype(np.int32)
            for i in range(stride):
                left = line[i - bypp] if i >= bypp else 0
                ul = int(prev[i - bypp]) if i >= bypp else 0
                line[i] = (line[i] + int(_paeth(np.uint8(left), prev[i],
                                                np.uint8(ul)))) & 0xFF
            line = line.astype(np.uint8)
        elif filt != 0:
            raise ValueError(f"{path}: unknown filter {filt}")
        out[row] = line
        prev = line

    if depth == 16:
        arr = out.reshape(h, w, nchan, 2)
        vals = (arr[..., 0].astype(np.float32) * 256.0
                + arr[..., 1].astype(np.float32)) / 65535.0
    else:
        vals = out.reshape(h, w, nchan).astype(np.float32) / 255.0

    if ctype == 3:
        idx = (vals[..., 0] * 255.0 + 0.5).astype(np.int32)
        rgb = palette[idx].astype(np.float32) / 255.0
        if trns is not None:
            a = np.ones(256, np.float32)
            a[:len(trns)] = trns.astype(np.float32) / 255.0
            return np.concatenate([rgb, a[idx][..., None]], axis=-1)
        return rgb
    return vals


def read_image(path: str) -> np.ndarray:
    """Read PNG via the stdlib decoder; other formats via PIL if present."""
    if path.lower().endswith(".png"):
        return read_png(path)
    try:
        from PIL import Image
    except ImportError as e:
        raise ValueError(
            f"{path}: only PNG is supported without PIL installed") from e
    with Image.open(path) as im:
        return np.asarray(im.convert("RGBA"), np.float32) / 255.0


def _to_rgba(img: np.ndarray) -> np.ndarray:
    """Normalize any [H, W, C]/[H, W] decode to RGBA."""
    if img.ndim == 2:
        img = img[..., None]
    c = img.shape[-1]
    if c == 1:
        img = np.repeat(img, 3, axis=-1)
    elif c == 2:  # gray + alpha
        return np.concatenate([np.repeat(img[..., :1], 3, axis=-1),
                               img[..., 1:]], axis=-1)
    if img.shape[-1] == 3:
        img = np.concatenate([img, np.ones(img.shape[:-1] + (1,), np.float32)],
                             axis=-1)
    return img.astype(np.float32)


def _resize_nearest(img: np.ndarray, h: int, w: int) -> np.ndarray:
    ys = (np.arange(h) * img.shape[0] // h).clip(0, img.shape[0] - 1)
    xs = (np.arange(w) * img.shape[1] // w).clip(0, img.shape[1] - 1)
    return img[ys][:, xs]


def load_texture_stack(paths) -> np.ndarray:
    """Load up to 4 image textures into the scene's f32[4, TH, TW, 4] slot
    (u_tex0..3, index.html:262).  Missing slots are white; differing sizes
    are nearest-resized to the first image's."""
    imgs = [_to_rgba(read_image(p)) for p in paths[:4]]
    if not imgs:
        return np.ones((4, 1, 1, 4), np.float32)
    th, tw = imgs[0].shape[:2]
    stack = np.ones((4, th, tw, 4), np.float32)
    for i, im in enumerate(imgs):
        if im.shape[:2] != (th, tw):
            im = _resize_nearest(im, th, tw)
        stack[i] = im
    return stack


# file name → our cubemap slot ([+x, -x, +y, -y, +z, -z]; the reference
# maps right/left/top/bottom/front/back to those GL faces, index.html:
# 267-270 × index.js:303-304)
_CUBE_FACES = ("right", "left", "top", "bottom", "front", "back")


def load_cubemap_dir(dirpath: str) -> np.ndarray:
    """Load a 6-face cubemap from a directory containing right/left/top/
    bottom/front/back.{png,jpg,jpeg} into f32[6, CH, CW, 3]."""
    faces = []
    for name in _CUBE_FACES:
        for ext in (".png", ".jpg", ".jpeg"):
            p = os.path.join(dirpath, name + ext)
            if os.path.exists(p):
                faces.append(_to_rgba(read_image(p))[..., :3])
                break
        else:
            raise FileNotFoundError(
                f"{dirpath}: missing cubemap face {name}.(png|jpg|jpeg)")
    ch, cw = faces[0].shape[:2]
    faces = [f if f.shape[:2] == (ch, cw) else _resize_nearest(f, ch, cw)
             for f in faces]
    return np.stack(faces).astype(np.float32)
