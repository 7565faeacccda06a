"""Config/CLI surface regressions."""

from nerf2mesh_tpu.config import Config, parse_args


def test_true_default_bools_survive_cli():
    # pool_points defaults True in the dataclass; the CLI must not silently
    # flip it (regression: store_true default=False pinned every main.py run
    # to the dense layout and the 2x-lower adaptive ray cap)
    cfg = parse_args(["/tmp/x", "--workspace", "/tmp/ws"])
    assert cfg.pool_points is True
    cfg = parse_args(["/tmp/x", "--workspace", "/tmp/ws", "--no-pool_points"])
    assert cfg.pool_points is False


def test_cli_matches_dataclass_defaults():
    cfg = parse_args(["/tmp/x", "--workspace", "/tmp/ws"])
    ref = Config(path="/tmp/x", workspace="/tmp/ws")
    import dataclasses
    for f in dataclasses.fields(Config):
        if f.name in ("refine_steps",):
            continue
        assert getattr(cfg, f.name) == getattr(ref.finalize(), f.name), f.name


def test_bucket_respects_cap(tmp_path):
    import dataclasses
    from nerf2mesh_tpu.utils.trainer import Trainer
    cfg = dataclasses.replace(
        Config(path=str(tmp_path)), workspace=str(tmp_path / "ws"),
        num_points=65536, samples_per_ray=32, grid_size=16,
        num_levels=4, log2_hashmap_size=10).finalize()
    t = Trainer(cfg)
    cap = (4 * cfg.num_points) // cfg.samples_per_ray      # pooled cap: 8192
    assert t.pool_size is not None
    for n in (1000, 3000, 6000, 9000, 14076, 40000):
        b = t._bucket(n)
        assert b <= cap and b >= 1024 and (b & (b - 1)) == 0, (n, b)
    assert t._bucket(14076) == 8192
