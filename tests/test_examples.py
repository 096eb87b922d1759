"""Headless smoke tests of the example scripts (tiny step counts)."""

import matplotlib

matplotlib.use("Agg")

import pytest


def test_pendulum_example_runs(capsys):
    from examples import pendulum as ex

    ex.main(save_mode=False, steps=3, use_gym=False)
    out = capsys.readouterr().out
    assert "average solve time" in out


def test_pendulum_example_episode_mode(capsys):
    """--episode: the single-dispatch loop on the internal simulator."""
    from examples import pendulum as ex

    ex.main(save_mode=False, steps=3, episode=True)
    out = capsys.readouterr().out
    assert "episode: " in out
    assert "final theta" in out


def test_cartpole_example_runs(capsys):
    from examples import cartpole as ex

    ex.main(save_mode=False, steps=3, use_gym=False)
    assert "average solve time" in capsys.readouterr().out


def test_cartpole_example_episode_mode(capsys):
    """--episode: the single-dispatch loop on the bang-bang dynamics."""
    from examples import cartpole as ex

    ex.main(save_mode=False, steps=3, episode=True)
    out = capsys.readouterr().out
    assert "episode: " in out and "final pole angle" in out


def test_mountaincar_example_runs(capsys):
    from examples import mountaincar as ex

    ex.main(save_mode=False, steps=3, use_gym=False)
    assert "average solve time" in capsys.readouterr().out


def test_mountaincar_example_episode_mode(capsys):
    """--episode: single-dispatch loop with the on-device hilltop test."""
    from examples import mountaincar as ex

    ex.main(save_mode=False, steps=3, episode=True)
    out = capsys.readouterr().out
    assert "episode: " in out and "final position" in out


@pytest.mark.slow
def test_navigation_example_runs(capsys, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from examples import navigation2d as ex

    ex.main(save_mode=True, max_steps=2, render=True)
    assert "average solve time" in capsys.readouterr().out
    # gif written from the captured frames
    assert (tmp_path / "video" / "navigation_2d_42.gif").exists()


@pytest.mark.slow
def test_navigation_example_episode_mode(capsys):
    """--episode: the single-dispatch loop with the on-device goal test."""
    from examples import navigation2d as ex

    ex.main(save_mode=False, max_steps=2, render=False, episode=True)
    assert "episode: " in capsys.readouterr().out


@pytest.mark.slow
def test_racing_example_runs(capsys, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from examples import racing as ex

    ex.main(save_mode=False, max_steps=2, render=False)
    assert "average solve time" in capsys.readouterr().out


@pytest.mark.slow
def test_racing_example_episode_mode(capsys):
    """--episode: the single-dispatch loop with the on-device goal test."""
    from examples import racing as ex

    ex.main(save_mode=False, max_steps=2, render=False, episode=True)
    assert "episode: " in capsys.readouterr().out


def test_danger_zone_example_runs(capsys):
    from examples import goal_in_danger_zone as ex

    ex.main(save_mode=False, render=False, max_steps=3)
    out = capsys.readouterr().out
    assert "episodic reward" in out and "episodic cost" in out


def test_danger_zone_example_episode_mode(capsys):
    """--episode: single-dispatch CMDP episode with vectorized bookkeeping."""
    from examples import goal_in_danger_zone as ex

    ex.main(save_mode=False, render=False, max_steps=3, episode=True)
    out = capsys.readouterr().out
    assert "episode: " in out
    assert "episodic reward" in out and "episodic cost" in out


@pytest.mark.slow
def test_racing_example_saves_gif(capsys, tmp_path, monkeypatch):
    """save_mode writes the gif artifact like the reference's video export
    (racing.py:241-251 / racing_env.py:313-325)."""
    monkeypatch.chdir(tmp_path)
    from examples import racing as ex

    ex.main(save_mode=True, max_steps=2, render=True)
    assert "average solve time" in capsys.readouterr().out
    assert (tmp_path / "video" / "racing_42.gif").exists()


@pytest.mark.slow
def test_danger_zone_example_saves_gif(capsys, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from examples import goal_in_danger_zone as ex

    ex.main(save_mode=True, max_steps=2)
    out = capsys.readouterr().out
    assert "episodic reward" in out
    assert (tmp_path / "video" / "goal_in_danger_zone_42.gif").exists()


def test_mujoco_example_runs(capsys):
    """Approximate-dynamics mujoco demo (mujoco_cartpole.py); skipped when
    the mujoco stack is unavailable."""
    pytest.importorskip("mujoco")
    gym = pytest.importorskip("gymnasium")
    try:
        gym.make("InvertedPendulum-v4").close()
    except Exception as exc:  # missing assets / GL stack
        pytest.skip(f"InvertedPendulum-v4 unavailable: {exc}")
    from examples import mujoco_cartpole as ex

    ex.main(save_mode=False, steps=2, render=False)
    assert "average solve time" in capsys.readouterr().out


def test_make_media_fast(tmp_path, monkeypatch):
    """examples/make_media.py renders the three gymnasium-workload gifs
    (reference media parity: /root/reference/media/*.gif)."""
    gymnasium = pytest.importorskip("gymnasium")  # noqa: F841
    import os
    import sys

    from examples import make_media

    monkeypatch.setattr(
        sys, "argv",
        ["make_media.py", "--fast", "--out", str(tmp_path)],
    )
    make_media.main()
    for name in ("pendulum", "cartpole", "mountaincar"):
        p = tmp_path / f"{name}.gif"
        assert p.exists() and os.path.getsize(p) > 0, name


@pytest.mark.slow
def test_racing_example_pipelined_mode(capsys):
    """--pipelined N: the PipelinedRunner serving demo closes the loop."""
    from examples import racing as ex

    ex.main(save_mode=False, max_steps=4, render=False, pipelined=2)
    assert "pipelined depth=2" in capsys.readouterr().out
