"""DeviceStream prefetch tests."""

import numpy as np

from ibu_tpu.io.stream import DeviceStream, stream_file
from ibu_tpu.ops.stats import checksum_records_np
from ibu_tpu.parallel.device import STATS_MAP_REDUCE, finalize_stats, make_mesh
from tests.conftest import make_records_arange


class TestDeviceStream:
    def test_yields_all_batches(self, tmp_ibu_file):
        path = tmp_ibu_file(make_records_arange(10_000))
        stream = stream_file(path, batch_records=2048)
        total = 0
        for dev_raw, valid in stream:
            total += int(np.asarray(valid).sum())
        assert total == 10_000

    def test_prefetch_depth_respected(self):
        produced = []

        def batches():
            for k in range(5):
                produced.append(k)
                yield make_records_arange(16)

        s = DeviceStream(batches(), prefetch=2)
        first = next(s)
        # after one consumption, at most 3 batches produced (1 consumed + 2 queued)
        assert len(produced) <= 3
        rest = list(s)
        assert len(rest) == 4

    def test_run_placed_matches_run(self, tmp_ibu_file):
        records = make_records_arange(25_000)
        path = tmp_ibu_file(records)
        mesh = make_mesh()
        got = finalize_stats(
            STATS_MAP_REDUCE.run_placed(
                stream_file(path, mesh=mesh, batch_records=4096), mesh=mesh
            )
        )
        want = checksum_records_np(records)
        assert got["count"] == 25_000
        assert (got["barcode_sum"], got["umi_sum"], got["index_sum"]) == want

    def test_empty_file(self, tmp_ibu_file):
        path = tmp_ibu_file(make_records_arange(0))
        assert list(stream_file(path)) == []
