from ffmpeg_tpu.utils.rational import (
    NOPTS, Rational, Rounding, compare_ts, rescale, rescale_q, rescale_rnd,
)


def test_reduce():
    assert Rational(2, 4).reduce() == Rational(1, 2)
    assert Rational(-2, -4).reduce() == Rational(1, 2)
    assert Rational(2, -4).reduce() == Rational(-1, 2)


def test_arith():
    assert Rational(1, 2) * Rational(2, 3) == Rational(1, 3)
    assert Rational(1, 2) + Rational(1, 3) == Rational(5, 6)
    assert float(Rational(1, 4)) == 0.25


def test_cmp():
    assert Rational(1, 3) < Rational(1, 2)
    assert Rational(1001, 30000) < Rational(1, 25)


def test_rescale_rounding():
    # matches av_rescale_rnd semantics
    assert rescale_rnd(7, 1, 2, Rounding.ZERO) == 3
    assert rescale_rnd(-7, 1, 2, Rounding.ZERO) == -3
    assert rescale_rnd(7, 1, 2, Rounding.INF) == 4
    assert rescale_rnd(-7, 1, 2, Rounding.INF) == -4
    assert rescale_rnd(7, 1, 2, Rounding.DOWN) == 3
    assert rescale_rnd(-7, 1, 2, Rounding.DOWN) == -4
    assert rescale_rnd(7, 1, 2, Rounding.UP) == 4
    assert rescale_rnd(-7, 1, 2, Rounding.UP) == -3
    assert rescale(7, 1, 2) == 4       # near, half away from zero
    assert rescale(-7, 1, 2) == -4
    assert rescale(5, 1, 2) == 3


def test_rescale_pass_minmax():
    assert rescale_rnd(NOPTS, 1, 2, Rounding.NEAR_INF | Rounding.PASS_MINMAX) == NOPTS


def test_rescale_q():
    # 90kHz → microseconds
    assert rescale_q(90000, Rational(1, 90000), Rational(1, 1000000)) == 1000000


def test_compare_ts():
    assert compare_ts(100, Rational(1, 25), 99, Rational(1, 25)) == 1
    assert compare_ts(1, Rational(1, 25), 1000, Rational(1, 25000)) == 0
    assert compare_ts(1, Rational(1, 25), 1001, Rational(1, 25000)) == -1
