"""Console/introspection utils (utils/console.py) — reference
tools_color_printf.hpp + tools_mem_used.h analogues (PARITY C19)."""

import io

from immesh_tpu.utils.console import (
    colorize, process_rss_mb, recommend_capacities, total_ram_mb,
)


class TestColor:
    def test_non_tty_passthrough(self):
        s = io.StringIO()
        assert colorize("hi", "red", stream=s) == "hi"

    def test_tty_wraps(self):
        class FakeTty(io.StringIO):
            def isatty(self):
                return True
        out = colorize("hi", "red", bold=True, stream=FakeTty())
        assert out.startswith("\033[31m\033[1m") and out.endswith("\033[0m")


class TestMem:
    def test_rss_positive_on_linux(self):
        assert process_rss_mb() > 1.0     # a python process is >1 MB

    def test_total_ram_positive(self):
        assert total_ram_mb() > 100.0


class TestCapacities:
    def test_powers_of_two_and_scaling(self):
        small = recommend_capacities(hbm_bytes=8 << 30)
        big = recommend_capacities(hbm_bytes=32 << 30)
        for d in (small, big):
            for v in d.values():
                assert v >= 1024 and (v & (v - 1)) == 0
        assert big["points_capacity"] > small["points_capacity"]

    def test_budget_respected(self):
        caps = recommend_capacities(hbm_bytes=16 << 30, fraction=0.25)
        used = (caps["points_capacity"] * 12
                + caps["mesh_voxel_capacity"] * 300
                + caps["plane_voxel_capacity"] * 250)
        assert used <= 16 * 2 ** 30 * 0.25
