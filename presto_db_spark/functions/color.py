"""Presto color/bar/render functions (ColorFunctions.java) — the terminal
rendering family.

Reference semantics reproduced exactly
(`presto-main/.../scalar/ColorFunctions.java`):

* ``color('#rgb')`` → 24-bit int with CSS nibble replication (`:278-298`);
  ``color('red'|'green'|...)`` → negative system-color encoding
  ``-(index+1)`` (`:88-105`);
* ``rgb(r, g, b)`` → ``(r<<16)|(g<<8)|b`` with 0-255 validation (`:109`);
* ``render(value, color)`` → ``ESC[38;5;{ansi}m`` + value + ``ESC[0m``
  where the ANSI-256 cube index is ``16 + 36·(r·6/256) + 6·(g·6/256) +
  b·6/256`` for rgb colors and the raw index for system colors
  (`:249-274`); ``render(boolean)`` → green ✓ / red ✗ (`:39-40`);
* ``bar(percent, width[, low, high])`` → ``count = trunc(percent·width)``
  clamped to [0, width] colored █ blocks, each block's color HSB-
  interpolated at ``i/(width-1)`` between low and high **in float32**
  (``java.awt.Color.RGBtoHSB``/``HSBtoRGB``), then ANSI reset + space
  padding to the requested width (`:193-233`).

The float32 HSB interpolation is reproduced bit-for-bit with numpy
float32 (`_rgb_to_hsb`/`_hsb_to_rgb` below mirror the AWT algorithms).
Because bar's gradient depends only on the block POSITION (a literal at
plan-build time), every block's escape string is precomputed driver-side
and embedded as a literal in BOTH the Spark expression and the DuckDB
oracle SQL — cross-engine parity is by construction, with zero runtime
float math.  The only runtime computation is the integer block count and
string assembly, which stays a JVM projection (no UDF in the registry
query's hot path; the registered SQL UDFs below are the paste-compat
surface).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

ANSI_RESET = "\x1b[0m"
BLOCK = "█"

SYSTEM_COLORS = {
    "black": 0, "red": 1, "green": 2, "yellow": 3,
    "blue": 4, "magenta": 5, "cyan": 6, "white": 7,
}


def parse_color(s: str) -> int:
    """ColorFunctions.color(varchar): '#rgb' → 24-bit int, names →
    -(index+1); raises on anything else (the reference's PrestoException)."""
    if len(s) == 4 and s[0] == "#":
        try:
            r, g, b = (int(c, 16) for c in s[1:])
        except ValueError:
            pass
        else:
            r, g, b = (v << 4 | v for v in (r, g, b))
            return (r << 16) | (g << 8) | b
    idx = SYSTEM_COLORS.get(s.lower())
    if idx is None:
        raise ValueError(f"Invalid color: '{s}'")
    return -(idx + 1)


def rgb_int(r: int, g: int, b: int) -> int:
    for v in (r, g, b):
        if not 0 <= v <= 255:
            raise ValueError("color component must be between 0 and 255")
    return (r << 16) | (g << 8) | b


def to_ansi(code: int) -> int:
    if code < 0:
        return -code - 1
    r, g, b = (code >> 16) & 0xFF, (code >> 8) & 0xFF, code & 0xFF
    return 16 + (r * 6 // 256) * 36 + (g * 6 // 256) * 6 + (b * 6 // 256)


def ansi_escape(code: int) -> str:
    return f"\x1b[38;5;{to_ansi(code)}m"


def _rgb_to_hsb(r: int, g: int, b: int) -> tuple[np.float32, np.float32, np.float32]:
    """java.awt.Color.RGBtoHSB, float32-faithful."""
    f32 = np.float32
    cmax, cmin = max(r, g, b), min(r, g, b)
    brightness = f32(cmax) / f32(255)
    saturation = f32(0) if cmax == 0 else f32(cmax - cmin) / f32(cmax)
    if saturation == 0:
        hue = f32(0)
    else:
        span = f32(cmax - cmin)
        redc = f32(cmax - r) / span
        greenc = f32(cmax - g) / span
        bluec = f32(cmax - b) / span
        if r == cmax:
            hue = bluec - greenc
        elif g == cmax:
            hue = f32(2) + redc - bluec
        else:
            hue = f32(4) + greenc - redc
        hue = hue / f32(6)
        if hue < 0:
            hue = hue + f32(1)
    return hue, saturation, brightness


def _hsb_to_rgb(h: np.float32, s: np.float32, v: np.float32) -> int:
    """java.awt.Color.HSBtoRGB, float32-faithful; returns 24-bit rgb."""
    f32 = np.float32
    if s == 0:
        c = int(v * f32(255) + f32(0.5))
        return (c << 16) | (c << 8) | c
    h6 = (h - np.floor(h)) * f32(6)
    f = h6 - np.floor(h6)
    p = v * (f32(1) - s)
    q = v * (f32(1) - s * f)
    t = v * (f32(1) - s * (f32(1) - f))
    half = f32(0.5)
    scale = f32(255)
    sector = int(h6)
    table = {
        0: (v, t, p), 1: (q, v, p), 2: (p, v, t),
        3: (p, q, v), 4: (t, p, v), 5: (v, p, q),
    }
    r_, g_, b_ = table[sector]
    r = int(r_ * scale + half)
    g = int(g_ * scale + half)
    b = int(b_ * scale + half)
    return (r << 16) | (g << 8) | b


def interpolate(fraction: float, low_rgb: int, high_rgb: int) -> int:
    """ColorFunctions.interpolate: HSB-space lerp at float32 precision."""
    f32 = np.float32
    fr = f32(fraction)
    lh, ls, lv = _rgb_to_hsb((low_rgb >> 16) & 0xFF, (low_rgb >> 8) & 0xFF, low_rgb & 0xFF)
    hh, hs, hv = _rgb_to_hsb((high_rgb >> 16) & 0xFF, (high_rgb >> 8) & 0xFF, high_rgb & 0xFF)
    h = fr * (hh - lh) + lh
    s = fr * (hs - ls) + ls
    v = fr * (hv - lv) + lv
    return _hsb_to_rgb(h, s, v) & 0xFFFFFF


def color_interp(fraction: float, low_rgb: int, high_rgb: int) -> int:
    """color(fraction, low, high): clamp to [0,1] then interpolate."""
    if low_rgb < 0 or high_rgb < 0:
        raise ValueError("interpolation endpoints must be rgb colors")
    return interpolate(min(1.0, max(0.0, fraction)), low_rgb, high_rgb)


def bar_pieces(width: int, low_rgb: int, high_rgb: int) -> list[str]:
    """Per-position escape+block strings — the precomputed literal table."""
    out = []
    for i in range(width):
        frac = np.float32(np.float64(i) * 1.0 / np.float64(width - 1))
        out.append(ansi_escape(interpolate(float(frac), low_rgb, high_rgb)) + BLOCK)
    return out


def bar_py(percent: float, width: int,
           low_rgb: int = 0xFF0000, high_rgb: int = 0x00FF00) -> str:
    """Row-level bar — the registered SQL UDF path (paste-compat)."""
    count = min(width, max(0, int(percent * width)))
    return "".join(bar_pieces(width, low_rgb, high_rgb)[:count]) + ANSI_RESET + " " * (width - count)


def render_py(value: str, code: int) -> str:
    return ansi_escape(code) + value + ANSI_RESET


RENDERED_TRUE = render_py("✓", parse_color("green"))
RENDERED_FALSE = render_py("✗", parse_color("red"))


# --- plan-time expression / oracle-SQL builders ----------------------------

def _count_expr(percent: Column, width: int) -> Column:
    return F.least(
        F.lit(width), F.greatest(F.lit(0), F.floor(percent * width).cast("int"))
    )


def bar_expr(percent: Column, width: int,
             low_rgb: int = 0xFF0000, high_rgb: int = 0x00FF00) -> Column:
    """bar() as a pure JVM expression: precomputed escapes, runtime count."""
    pieces = bar_pieces(width, low_rgb, high_rgb)
    cnt = _count_expr(percent, width)
    blocks = [
        F.when(F.lit(i) < cnt, F.lit(pieces[i])).otherwise(F.lit(""))
        for i in range(width)
    ]
    padding = F.substring(F.lit(" " * width), F.lit(1), F.lit(width) - cnt)
    return F.concat(*blocks, F.lit(ANSI_RESET), padding)


def bar_sql(percent_sql: str, width: int,
            low_rgb: int = 0xFF0000, high_rgb: int = 0x00FF00) -> str:
    """The SAME construction for the DuckDB oracle (shared literal table)."""
    pieces = bar_pieces(width, low_rgb, high_rgb)
    cnt = f"least({width}, greatest(0, CAST(floor(({percent_sql}) * {width}) AS INTEGER)))"
    blocks = " || ".join(
        f"(CASE WHEN {i} < {cnt} THEN '{pieces[i]}' ELSE '' END)" for i in range(width)
    )
    return f"({blocks} || '{ANSI_RESET}' || repeat(' ', {width} - {cnt}))"


def render_expr(value: Column, code: int) -> Column:
    return F.concat(F.lit(ansi_escape(code)), value, F.lit(ANSI_RESET))


def render_sql(value_sql: str, code: int) -> str:
    return f"('{ansi_escape(code)}' || {value_sql} || '{ANSI_RESET}')"
