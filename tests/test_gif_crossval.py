"""Cross-validation of the pure-Python GIF codec against the JDK's
ImageIO GIF reader — an independent implementation. Compiled on first
use via javac (present alongside Spark's JVM); skips cleanly without
it.

ImageIO's reader returns each frame's own raster (no compositing), so
the comparison uses full-canvas frames where per-frame raster ==
per-frame display — which still exercises the variable-width LZW,
palette lookup, and animation structure end to end on REAL pixel
patterns our dictionary-building encoder compresses.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile

import pytest

_JAVA = None

_SRC = """
import java.io.File;
import java.util.Iterator;
import javax.imageio.ImageIO;
import javax.imageio.ImageReader;
import javax.imageio.stream.ImageInputStream;
import java.awt.image.BufferedImage;

public class GifDump {
  public static void main(String[] args) throws Exception {
    ImageInputStream in = ImageIO.createImageInputStream(new File(args[0]));
    Iterator<ImageReader> it = ImageIO.getImageReaders(in);
    if (!it.hasNext()) { System.err.println("no reader"); System.exit(2); }
    ImageReader r = it.next();
    r.setInput(in);
    int n = r.getNumImages(true);
    System.out.println("frames " + n);
    for (int i = 0; i < n; i++) {
      BufferedImage img = r.read(i);
      int w = img.getWidth(), h = img.getHeight();
      StringBuilder sb = new StringBuilder(i + " " + w + " " + h);
      for (int y = 0; y < h; y++)
        for (int x = 0; x < w; x++) {
          int p = img.getRGB(x, y);
          sb.append(' ').append((p >> 16) & 0xFF).append(' ')
            .append((p >> 8) & 0xFF).append(' ').append(p & 0xFF);
        }
      System.out.println(sb);
    }
  }
}
"""


def _harness():
    global _JAVA
    if _JAVA is not None:
        return _JAVA or None
    _JAVA = False
    if not shutil.which("javac") or not shutil.which("java"):
        return None
    d = os.path.join(tempfile.gettempdir(), "jbp_gifcheck")
    os.makedirs(d, exist_ok=True)
    src = os.path.join(d, "GifDump.java")
    with open(src, "w") as f:
        f.write(_SRC)
    r = subprocess.run(["javac", "-d", d, src], capture_output=True)
    if r.returncode != 0:
        return None
    _JAVA = d
    return d


def _need():
    d = _harness()
    if not d:
        pytest.skip("javac/java unavailable")
    return d


def _java_frames(d, path):
    out = subprocess.run(
        ["java", "-cp", d, "GifDump", path], capture_output=True, text=True
    )
    assert out.returncode == 0, out.stderr
    lines = out.stdout.splitlines()
    n = int(lines[0].split()[1])
    frames = []
    for ln in lines[1:]:
        parts = list(map(int, ln.split()))
        i, w, h = parts[0], parts[1], parts[2]
        px = parts[3:]
        frames.append((i, w, h, px))
    assert len(frames) == n
    return frames


def test_imageio_reads_solid_animation(tmp_path):
    d = _need()
    from journal_batch_processer_spark.operators.gif import (
        decode_gif_frames,
        encode_gif_solid_frames,
    )

    pal = [(10, 20, 30), (200, 100, 0), (0, 0, 255)]
    data = encode_gif_solid_frames(9, 6, pal, [(0, 4), (1, 5), (2, 6)])
    p = str(tmp_path / "s.gif")
    with open(p, "wb") as f:
        f.write(data)
    jf = _java_frames(d, p)
    ours = decode_gif_frames(data)
    assert len(jf) == ours["n_frames"] == 3
    for (i, w, h, px), f in zip(jf, ours["frames"]):
        assert (w, h) == (ours["width"], ours["height"])
        r, g, b = pal[i]
        assert set(px[0::3]) == {r} and set(px[1::3]) == {g}
        assert set(px[2::3]) == {b}
        assert (f["mean_r"], f["mean_g"], f["mean_b"]) == (r, g, b)


def test_imageio_reads_patterned_frames_pixel_exact(tmp_path):
    """LCG-pattern rasters: the JDK's LZW decode of OUR encoder's
    stream must match the input pixel-for-pixel, and our own decoder
    must composite to the same frames (full-canvas, no disposal
    carry-over)."""
    import random

    d = _need()
    from journal_batch_processer_spark.operators.gif import (
        decode_gif_frames,
        encode_gif_frames_indexed,
    )

    rng = random.Random(21)
    pal = [(rng.randrange(256), rng.randrange(256), rng.randrange(256))
           for _ in range(16)]
    w, h = 13, 7
    rasters = [
        [rng.randrange(len(pal)) for _ in range(w * h)] for _ in range(3)
    ]
    data = encode_gif_frames_indexed(
        w, h, pal, [(r, 5) for r in rasters]
    )
    p = str(tmp_path / "p.gif")
    with open(p, "wb") as f:
        f.write(data)
    jf = _java_frames(d, p)
    assert len(jf) == 3
    for (i, jw, jh, px), raster in zip(jf, rasters):
        assert (jw, jh) == (w, h)
        want = [c for idx in raster for c in pal[idx]]
        assert px == want, f"frame {i} pixel mismatch vs ImageIO"
    ours = decode_gif_frames(data)
    for f, raster in zip(ours["frames"], rasters):
        n = w * h
        means = (
            sum(pal[i][0] for i in raster) / n,
            sum(pal[i][1] for i in raster) / n,
            sum(pal[i][2] for i in raster) / n,
        )
        assert (f["mean_r"], f["mean_g"], f["mean_b"]) == means
