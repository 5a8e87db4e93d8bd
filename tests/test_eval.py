import math

import pytest

from ffmpeg_tpu.utils.error import InvalidData
from ffmpeg_tpu.utils.eval import eval_expr, strtod


def test_basic_arith():
    assert eval_expr("1+2*3") == 7
    assert eval_expr("(1+2)*3") == 9
    assert eval_expr("2^10") == 1024
    assert eval_expr("10%3") == 1
    assert eval_expr("-4+2") == -2


def test_si_postfix():
    assert strtod("1k") == 1000
    assert strtod("1M") == 1e6
    assert strtod("1Ki") == 1024
    assert strtod("0x10") == 16


def test_functions():
    assert eval_expr("max(3, 7)") == 7
    assert eval_expr("min(3, 7)") == 3
    assert eval_expr("if(gt(2,1), 10, 20)") == 10
    assert eval_expr("clip(15, 0, 10)") == 10
    assert eval_expr("between(5, 0, 10)") == 1
    assert abs(eval_expr("sin(PI/2)") - 1.0) < 1e-12
    assert eval_expr("floor(2.7)") == 2
    assert eval_expr("ceil(2.2)") == 3
    assert eval_expr("round(2.5)") == 3
    assert eval_expr("round(-2.5)") == -3
    assert eval_expr("mod(7,3)") == 1
    assert eval_expr("pow(2,8)") == 256
    assert eval_expr("sqrt(16)") == 4
    assert eval_expr("abs(-5)") == 5
    assert eval_expr("bitand(12, 10)") == 8
    assert eval_expr("bitor(12, 10)") == 14


def test_st_ld():
    assert eval_expr("st(0, 42) + ld(0)") == 84


def test_variables():
    assert eval_expr("iw/2", {"iw": 1920}) == 960
    assert eval_expr("iw-ow", {"iw": 100, "ow": 40}) == 60


def test_constants():
    assert abs(eval_expr("PI") - math.pi) < 1e-15
    assert abs(eval_expr("E") - math.e) < 1e-15


def test_div_by_zero():
    assert eval_expr("1/0") == math.inf
    assert math.isnan(eval_expr("0/0"))


def test_errors():
    with pytest.raises(InvalidData):
        eval_expr("nosuchvar")
    with pytest.raises(InvalidData):
        eval_expr("1+")
    with pytest.raises(InvalidData):
        eval_expr("1 2")
