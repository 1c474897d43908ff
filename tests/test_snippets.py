import numpy as np
import pytest

from rollingdepth_tpu.pipelines.snippets import (
    cap_max_dilation,
    coverage_count,
    current_gap,
    snippet_index_matrix,
    snippet_indices,
)


def reference_get_snippet_indice(i_step, total_step, seq_len, snippet_len,
                                 dilation_start, dilation_end, stride):
    """Re-derivation of the reference algorithm
    (/root/reference/rollingdepth/rollingdepth_pipeline.py:465-502) used as a
    test oracle."""
    gap_start, gap_end = dilation_start - 1, dilation_end - 1
    gap_cur = int((1 - i_step / total_step) * (gap_start - gap_end) + gap_end)
    out = []
    total_window_size = (snippet_len - 1) * (gap_cur + 1) + 1
    i_start_ls = list(range(0, seq_len - total_window_size + 1, stride))
    if i_start_ls[-1] < seq_len - total_window_size:
        i_start_ls.append(seq_len - total_window_size)
    for i_start in i_start_ls:
        out.append(list(range(i_start, i_start + total_window_size, gap_cur + 1)))
    return out


@pytest.mark.parametrize("seq_len,snippet_len,dilation", [
    (10, 3, 1), (100, 3, 25), (100, 3, 10), (30, 2, 5), (100, 4, 7), (9, 3, 2),
])
def test_snippet_indices_match_reference(seq_len, snippet_len, dilation):
    ours = snippet_indices(seq_len, snippet_len, dilation)
    ref = reference_get_snippet_indice(0, 1, seq_len, snippet_len, dilation, dilation, 1)
    assert ours == ref
    # stride-1 count: S = seq_len - (n-1)*d
    assert len(ours) == seq_len - (snippet_len - 1) * dilation


def test_refinement_gap_annealing():
    # gap shrinks linearly from start_dilation-1 to 0 over the steps
    # (/root/reference/rollingdepth/rollingdepth_pipeline.py:482-483)
    gaps = [current_gap(i, 10, 6, 1) for i in range(10)]
    assert gaps[0] == 5
    assert gaps[-1] == 0 or gaps[-1] == gaps[-2] <= 1
    assert all(a >= b for a, b in zip(gaps, gaps[1:]))


def test_cap_max_dilation():
    # floor(seq/snippet)-1 cap (/root/reference/.../rollingdepth_pipeline.py:504-515)
    assert cap_max_dilation(100, 3, 25) == 25
    assert cap_max_dilation(30, 3, 25) == 9
    assert cap_max_dilation(9, 3, 5) == 2


def test_index_matrix_and_coverage():
    m = snippet_index_matrix(20, 3, 4)
    assert m.shape == (20 - 2 * 4, 3)
    cov = coverage_count(m, 20)
    assert cov.sum() == m.size
    assert (cov > 0).all()
    padded = snippet_index_matrix(20, 3, 4, pad_to=16)
    assert padded.shape == (16, 3)
    assert (padded[-1] == m[-1]).all()


def test_full_coverage_property():
    for seq_len, d in [(100, 25), (75, 10), (100, 1)]:
        m = snippet_index_matrix(seq_len, 3, d)
        assert set(np.unique(m)) == set(range(seq_len))


def test_pick_chunk_is_length_independent():
    """Chunk sizes must not be derived from the work count beyond the
    small-s clamp: a length-dependent chunk recompiles the UNet per clip
    length (minutes) to save milliseconds of padding."""
    from rollingdepth_tpu.pipelines.rollingdepth import _pick_chunk

    # any s >= max_chunk gets exactly max_chunk (fixed program)
    for s in (16, 17, 60, 80, 100, 1000):
        assert _pick_chunk(s, 16) == 16
    # small s clamps to the next multiple of 4 (tiny test workloads)
    assert _pick_chunk(3, 16) == 4
    assert _pick_chunk(6, 16) == 8
    assert _pick_chunk(15, 16) == 16
    assert _pick_chunk(1, 16) == 4


def test_pick_chunk_dp_aware():
    """Small workloads size the chunk by per-device share on dp meshes: 6
    snippets on dp=4 should run 2-per-device rows (chunk 4 after the
    multiple-of-4 clamp), not pad to max_chunk*dp rows."""
    from rollingdepth_tpu.pipelines.chunking import pick_chunk

    assert pick_chunk(100, 16) == 16          # large s: always max_chunk
    assert pick_chunk(10, 16) == 12           # dp=1 small clamp (round up 4)
    assert pick_chunk(6, 16, dp=4) == 4       # ceil(6/4)=2 -> clamp 4
    assert pick_chunk(20, 16, dp=4) == 8      # ceil(20/4)=5 -> clamp 8
    assert pick_chunk(64, 16, dp=4) == 16     # s >= max_chunk*dp
    assert pick_chunk(1, 16) == 4


class TestPartitionIndexMatrix:
    """TURBO-refine window scheduling (partition_index_matrix)."""

    @pytest.mark.parametrize("seq_len", [6, 7, 8, 20, 24, 60, 61, 253])
    @pytest.mark.parametrize("dilation", [1, 2, 3, 6])
    @pytest.mark.parametrize("phase", [0, 1, 2, 5])
    def test_full_coverage_any_phase(self, seq_len, dilation, phase):
        from rollingdepth_tpu.pipelines.snippets import partition_index_matrix

        n = 3
        if seq_len < n * dilation:  # degenerate-chain territory, below
            pytest.skip("chain shorter than a window")
        m = partition_index_matrix(seq_len, n, dilation, phase=phase)
        assert m.shape[1] == n
        assert m.min() >= 0 and m.max() < seq_len
        covered = coverage_count(m, seq_len)
        assert (covered >= 1).all(), f"uncovered frames: {np.where(covered == 0)[0]}"
        # windows respect the dilation spacing
        assert (np.diff(m, axis=1) == dilation).all()

    def test_overlap_is_near_one(self):
        """The point of the partition: ~1x coverage vs stride-1's ~n x."""
        from rollingdepth_tpu.pipelines.snippets import partition_index_matrix

        n, seq_len = 3, 60
        for d in (1, 2, 4, 6):
            part = partition_index_matrix(seq_len, n, d, phase=1)
            full = snippet_index_matrix(seq_len, n, d)
            assert part.shape[0] * 3 <= full.shape[0] * 2, (
                f"d={d}: partition {part.shape[0]} windows vs stride-1 "
                f"{full.shape[0]} — not a ~{n}x reduction"
            )
            mean_cov = coverage_count(part, seq_len).mean()
            assert mean_cov < 1.6, f"d={d}: mean coverage {mean_cov}"

    def test_phase_rotation_moves_boundaries(self):
        from rollingdepth_tpu.pipelines.snippets import partition_index_matrix

        a = partition_index_matrix(30, 3, 1, phase=0)
        b = partition_index_matrix(30, 3, 1, phase=1)
        assert set(map(tuple, a)) != set(map(tuple, b))

    def test_degenerate_short_chain_clamps(self):
        from rollingdepth_tpu.pipelines.snippets import partition_index_matrix

        # seq_len=7, d=3: chains have lengths 3,2,2 — short chains clamp
        m = partition_index_matrix(7, 3, 3, phase=0)
        covered = coverage_count(m, 7)
        assert (covered >= 1).all()
        assert m.max() < 7 and m.min() >= 0


class TestChainStrideIndexMatrix:
    """The stride dial (chain_stride_index_matrix): the reference's pipelines
    declare a ``strides`` parameter but raise NotImplementedError for any
    value != 1 (rollingdepth_pipeline.py:240-241, rollingimg_pipeline.py:
    686-687); here stride s in [1, snippet_len] tiles each dilation chain
    with windows every s hops — s=1 is the reference window set, s=n the
    turbo partition, in between a quality/throughput dial."""

    @pytest.mark.parametrize("seq_len", [9, 20, 24, 60, 61, 253])
    @pytest.mark.parametrize("dilation", [1, 2, 3])
    @pytest.mark.parametrize("stride", [1, 2, 3])
    def test_full_coverage_and_spacing(self, seq_len, dilation, stride):
        from rollingdepth_tpu.pipelines.snippets import chain_stride_index_matrix

        n = 3
        if seq_len < n * dilation:
            pytest.skip("chain shorter than a window")
        m = chain_stride_index_matrix(seq_len, n, dilation, stride)
        assert m.shape[1] == n
        assert m.min() >= 0 and m.max() < seq_len
        assert (np.diff(m, axis=1) == dilation).all()
        covered = coverage_count(m, seq_len)
        assert (covered >= 1).all(), f"uncovered: {np.where(covered == 0)[0]}"

    def test_stride_1_is_the_reference_window_set(self):
        from rollingdepth_tpu.pipelines.snippets import chain_stride_index_matrix

        for seq_len, d in [(20, 1), (20, 2), (61, 3)]:
            ours = chain_stride_index_matrix(seq_len, 3, d, stride=1)
            ref = snippet_index_matrix(seq_len, 3, d)
            # same windows; rows are grouped by chain instead of start frame
            assert set(map(tuple, ours)) == set(map(tuple, ref))

    def test_stride_n_is_the_turbo_partition(self):
        from rollingdepth_tpu.pipelines.snippets import (
            chain_stride_index_matrix,
            partition_index_matrix,
        )

        for seq_len, d, phase in [(24, 1, 0), (24, 2, 1), (60, 3, 2)]:
            a = chain_stride_index_matrix(seq_len, 3, d, stride=3, phase=phase)
            b = partition_index_matrix(seq_len, 3, d, phase=phase)
            assert (a == b).all()

    def test_window_count_scales_inversely_with_stride(self):
        from rollingdepth_tpu.pipelines.snippets import chain_stride_index_matrix

        counts = [
            chain_stride_index_matrix(60, 3, 2, stride=s).shape[0]
            for s in (1, 2, 3)
        ]
        assert counts[0] > counts[1] > counts[2]
        # ~s x fewer windows (head/tail clamps keep it approximate)
        assert counts[1] <= counts[0] // 2 + 2
        mean_cov = coverage_count(
            chain_stride_index_matrix(60, 3, 2, stride=2), 60
        ).mean()
        assert 1.0 <= mean_cov <= 2.0  # between partition (~1) and stride-1 (~3)

    def test_invalid_stride_raises(self):
        from rollingdepth_tpu.pipelines.snippets import chain_stride_index_matrix

        with pytest.raises(ValueError):
            chain_stride_index_matrix(20, 3, 1, stride=4)  # > snippet_len
        with pytest.raises(ValueError):
            chain_stride_index_matrix(20, 3, 1, stride=0)
