"""AsyncEntropyCoder (X5 pipelining) parity with the sync coder."""

import numpy as np

from dcvc_tpu.entropy.coder import AsyncEntropyCoder, EntropyCoder
from tests.test_rans import make_gaussian_cdfs


def test_async_coder_matches_sync():
    from dcvc_tpu.entropy.coder import CdfTable

    cdfs, sizes, offsets = make_gaussian_cdfs()
    table = CdfTable(cdfs, sizes, offsets)
    rng = np.random.default_rng(0)
    chunks = [(rng.integers(-50, 50, 512).astype(np.int16),
               rng.integers(0, cdfs.shape[0], 512).astype(np.int16))
              for _ in range(3)]

    sync = EntropyCoder(False, 2)
    sync.reset()
    for s, i in chunks:
        sync.encode_with_indexes(s, i, table)
    sync.flush()
    expected = sync.get_encoded_stream()

    a = AsyncEntropyCoder(stream_part=2)
    a.reset()
    for s, i in chunks:
        a.encode_with_indexes(s, i, table)
    a.flush()
    got = a.get_encoded_stream()
    assert got == expected

    # decode through the async object's sync decoder side
    a.set_stream(got)
    for s, i in chunks:
        out = a.decode_stream(i, table)
        np.testing.assert_array_equal(out, s)
    a.close()
