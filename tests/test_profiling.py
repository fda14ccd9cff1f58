from pupiloptixlab_tpu.utils.profiling import FrameStats, Stopwatch, annotate


def test_frame_stats_summary():
    fs = FrameStats(window=4)
    for ms in (10.0, 20.0, 30.0, 40.0, 50.0):  # rolls past window
        fs.record_frame(ms)
    fs.record_pass("pt", 9.0)
    s = fs.summary()
    assert s["frames"] == 4
    assert s["frame_ms"]["mean"] == 35.0
    assert s["passes"]["pt"] == 9.0
    assert s["fps"] > 0


def test_frame_stats_binds_to_system(reference_scene_dir):
    from pupiloptixlab_tpu.passes import PTPass
    from pupiloptixlab_tpu.system import System

    system = System()
    system.add_pass(PTPass(max_depth=1))
    assert system.set_scene(reference_scene_dir / "cornellbox.xml")
    system.world.scene.sensor.film.w = 8
    system.world.scene.sensor.film.h = 8
    system.world._scene_dirty = True
    system.events.dispatch("system/scene_load", system.world)

    fs = FrameStats()
    fs.bind(system)
    system.run(max_frames=2)
    s = fs.summary()
    assert s["frames"] == 2
    assert "Path Tracing" in s["passes"]


def test_stopwatch_and_annotate():
    sw = Stopwatch()
    with sw.lap("x"):
        pass
    assert "x" in sw.laps
    with annotate("phase"):
        pass
