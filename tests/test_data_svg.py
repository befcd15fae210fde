"""SVG data-layer tests: native rasterizer, clean/validity/fallback
semantics (SURVEY.md §4 tier 1)."""

import numpy as np
import pytest

from starvector_tpu.data import rasterize as rz
from starvector_tpu.data import svg_util as su

RED_SQUARE = (
    '<svg xmlns="http://www.w3.org/2000/svg" viewBox="0 0 10 10">'
    '<rect x="2" y="2" width="6" height="6" fill="red"/></svg>'
)
CIRCLE = (
    '<svg xmlns="http://www.w3.org/2000/svg" viewBox="0 0 10 10">'
    '<circle cx="5" cy="5" r="3" fill="#0000ff"/></svg>'
)
BROKEN = "<svg><path d='M 0 0 L bad'/></svg>"

needs_native = pytest.mark.skipif(
    not rz.rasterizer_available(), reason="librsvg/cairo unavailable"
)


@needs_native
def test_rasterize_red_square():
    img = rz.rasterize_svg(RED_SQUARE, resolution=64)
    arr = np.asarray(img)
    assert arr.shape == (64, 64, 3)
    # corners white, center red
    assert (arr[0, 0] == [255, 255, 255]).all()
    c = arr[32, 32]
    assert c[0] > 200 and c[1] < 60 and c[2] < 60


@needs_native
def test_rasterize_invalid_falls_back_to_white():
    img = rz.rasterize_svg("this is not svg at all <<>>", resolution=32)
    arr = np.asarray(img)
    assert (arr == 255).all()


@needs_native
def test_clean_svg_roundtrip_renders_same():
    cleaned = rz.clean_svg(CIRCLE)
    assert "<?xml" not in cleaned
    assert "svg" in cleaned
    a = np.asarray(rz.rasterize_svg(CIRCLE, resolution=64), np.float32)
    b = np.asarray(rz.rasterize_svg(cleaned, resolution=64), np.float32)
    # normalized SVG must render to (nearly) the same image
    assert np.abs(a - b).mean() < 3.0


@needs_native
def test_clean_svg_garbage_gives_placeholder():
    out = rz.clean_svg("<nope")
    assert out.strip() == rz.VOID_SVG or "svg" in out


@needs_native
def test_process_and_rasterize():
    out_svg, img = rz.process_and_rasterize_svg(RED_SQUARE, resolution=64)
    assert out_svg == RED_SQUARE  # already valid → untouched
    assert np.asarray(img).shape == (64, 64, 3)

    out_svg2, img2 = rz.process_and_rasterize_svg("<totally busted", resolution=64)
    assert out_svg2 == rz.VOID_SVG
    assert (np.asarray(img2) == 255).all()


# --- pure path/validity utilities (no native lib needed) -------------------

def test_tokenize_path_basic():
    cmds = su.tokenize_path("M 0 0 L 10 0 C 1 2 3 4 5 6 Z")
    assert [c.cmd for c in cmds] == ["M", "L", "C", "Z"]
    assert cmds[2].args == [1, 2, 3, 4, 5, 6]


def test_tokenize_implicit_lineto():
    cmds = su.tokenize_path("M 0 0 10 10 20 20")
    assert [c.cmd for c in cmds] == ["M", "L", "L"]


def test_tokenize_arc_flags():
    cmds = su.tokenize_path("M 0 0 A 5 5 0 1 0 10 10")
    assert cmds[1].args == [5, 5, 0, 1, 0, 10, 10]


def test_tokenize_rejects_garbage():
    with pytest.raises(su.PathParseError):
        su.tokenize_path("M 0 0 L bad")
    with pytest.raises(su.PathParseError):
        su.tokenize_path("10 20")


def test_is_valid_svg():
    assert su.is_valid_svg_strict(RED_SQUARE)
    assert su.is_valid_svg_strict(CIRCLE)
    assert not su.is_valid_svg_strict(BROKEN)
    assert not su.is_valid_svg_strict("not xml")


def test_shapes_to_paths():
    paths = su.parse_svg_paths(CIRCLE)
    assert len(paths) == 1
    tag, cmds, _ = paths[0]
    assert tag == "circle"
    assert cmds[0].cmd == "M"


def test_path_roundtrip():
    d = "M 0 0 L 10 0 C 1 2 3 4 5 6 Z"
    s = su.path_to_str(su.tokenize_path(d))
    assert su.tokenize_path(s) == su.tokenize_path(d)


def test_find_unclosed_tags():
    svg = "<svg><g><rect/><path d='M0 0'></path></svg>"
    assert su.find_unclosed_tags(svg) == ["g"]
    assert su.find_unclosed_tags("<svg><g></g></svg>") == []
