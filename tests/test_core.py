import math

import pytest

from rgbd_gan_tpu.core import (
    Config,
    decompose_stage,
    legacy_stage_at,
    parse_stage_interval,
    resolution_of_stage,
    stage_at,
)


class TestConfig:
    def test_missing_key_is_none(self):
        c = Config({"a": 1})
        assert c.a == 1
        assert c.not_there is None

    def test_item_access_raises(self):
        c = Config({"a": 1})
        with pytest.raises(KeyError):
            c["nope"]

    def test_mutation_roundtrip(self):
        c = Config({"a": 1})
        c.gpu = 3
        assert c.gpu == 3
        assert c.to_dict()["gpu"] == 3

    def test_falsy_default_pattern(self):
        # the reference pattern `config.x if config.x else default`
        c = Config({})
        assert (c.lambda_geometric if c.lambda_geometric else 3) == 3


class TestStageSchedule:
    # the shipped ffhq/shapenet schedule
    INTERVALS = parse_stage_interval("0,0,0,0,0,0,0,100000, 150000, 160000, 180000, 1000000")
    MAX_STAGE = 11

    def test_parse(self):
        assert self.INTERVALS == [0, 0, 0, 0, 0, 0, 0, 100000, 150000, 160000, 180000, 1000000]

    def test_start_at_stage6(self):
        # iteration 0: first boundary passed is i=7 (100000): stage = 6 + 0/1e5
        assert stage_at(0, self.INTERVALS, self.MAX_STAGE) == pytest.approx(6.0)

    def test_linear_growth_within_interval(self):
        assert stage_at(50000, self.INTERVALS, self.MAX_STAGE) == pytest.approx(6.5)
        assert stage_at(99999, self.INTERVALS, self.MAX_STAGE) == pytest.approx(6.99999)

    def test_fade_in_segment(self):
        # between 100000 and 150000 the stage goes 7 -> 8
        assert stage_at(100000, self.INTERVALS, self.MAX_STAGE) == pytest.approx(7.0)
        assert stage_at(125000, self.INTERVALS, self.MAX_STAGE) == pytest.approx(7.5)

    def test_saturation(self):
        assert stage_at(10_000_000, self.INTERVALS, self.MAX_STAGE) == pytest.approx(
            self.MAX_STAGE - 1e-8
        )

    def test_legacy_linear(self):
        assert legacy_stage_at(50, 100, 11) == pytest.approx(0.5)
        assert legacy_stage_at(100000, 100, 11) == pytest.approx(11 - 1e-8)

    def test_decompose(self):
        floor, alpha = decompose_stage(7.25)
        assert floor == 7 and alpha == pytest.approx(0.25)
        floor, alpha = decompose_stage(99.0, max_stage=17)
        assert floor == 16  # clamped to 17 - 1e-8

    def test_resolutions(self):
        # even stage s -> 4*2^(s/2); odd s -> already at the next size
        expected = {0: 4, 1: 8, 2: 8, 3: 16, 4: 16, 5: 32, 6: 32, 7: 64, 8: 64, 9: 128, 10: 128}
        for s, r in expected.items():
            assert resolution_of_stage(s) == r, s

    def test_stage_resolution_consistency_with_floor(self):
        for it in [0, 1, 99_999, 100_000, 149_999, 179_999, 200_000]:
            st = stage_at(it, self.INTERVALS, self.MAX_STAGE)
            floor, alpha = decompose_stage(st, self.MAX_STAGE)
            assert 0.0 <= alpha < 1.0
            assert floor <= self.MAX_STAGE - 1
            assert resolution_of_stage(floor) in (4, 8, 16, 32, 64, 128)
