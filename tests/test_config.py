"""Config loader tests (reference behavior: web/api/_localEnv.js,
processor.js parseBoolean, transcribe.js/upload.js duplicates)."""

import os

from manual_whisper_tpu import config


def test_parse_dotenv_basics():
    parsed = config.parse_dotenv(
        "# comment\n"
        "A=1\n"
        "B = spaced \n"
        "export C=exported\n"
        "BAD_LINE\n"
        "D='single quoted'\n"
        'E="double quoted"\n'
        "F=F=duplicated\n"
    )
    assert parsed == {
        "A": "1", "B": "spaced", "C": "exported",
        "D": "single quoted", "E": "double quoted", "F": "duplicated",
    }


def test_env_file_fallback(tmp_path, monkeypatch):
    (tmp_path / ".env.local").write_text("KEY1=local\nSHARED=from_local\n")
    (tmp_path / ".env").write_text("KEY2=dotenv\nSHARED=from_env\n")
    monkeypatch.chdir(tmp_path)
    config.clear_env_cache()
    assert config.get_env("KEY1") == "local"
    assert config.get_env("KEY2") == "dotenv"
    # .env.local wins (reference: _localEnv.js file order)
    assert config.get_env("SHARED") == "from_local"
    # process env wins over files
    monkeypatch.setenv("KEY1", "process")
    assert config.get_env("KEY1") == "process"
    # blank process env falls through to files
    monkeypatch.setenv("KEY2", "")
    assert config.get_env("KEY2") == "dotenv"
    assert config.get_env("MISSING", "dflt") == "dflt"


def test_parse_boolean_matrix():
    # reference: processor.js:323-329
    for truthy in ("1", "true", "yes", "on", " TRUE ", "Yes"):
        assert config.parse_boolean(truthy, False) is True
    for falsy in ("0", "false", "no", "off", " OFF "):
        assert config.parse_boolean(falsy, True) is False
    assert config.parse_boolean("maybe", True) is True
    assert config.parse_boolean(None, False) is False
    assert config.parse_boolean(123, True) is True


def test_replacement_maps():
    # reference: processor.js:340-368
    assert config.parse_replacement_map_from_json(
        '{"文艺标识":"唯一标识"," a ":" b ","x":1,"":"y"}'
    ) == {"文艺标识": "唯一标识", "a": "b"}
    assert config.parse_replacement_map_from_json("not json") == {}
    assert config.parse_replacement_map_from_json("[1,2]") == {}
    assert config.parse_replacement_map_from_pairs(
        "a=b; c = d ;;bad;=skip;x="
    ) == {"a": "b", "c": "d"}


def test_typed_getters(monkeypatch):
    monkeypatch.setenv("INT_OK", "42")
    monkeypatch.setenv("INT_BAD", "4.2")
    monkeypatch.setenv("FLOAT_OK", "0.36")
    assert config.get_int("INT_OK", 1) == 42
    assert config.get_int("INT_BAD", 7) == 7
    assert config.get_float("FLOAT_OK", 0.0) == 0.36
    assert config.get_float("FLOAT_MISSING", 0.5) == 0.5


def test_maybe_enable_compile_cache(monkeypatch, tmp_path):
    from manual_whisper_tpu import config as c
    import jax

    monkeypatch.delenv("MWX_COMPILE_CACHE_DIR", raising=False)
    c.clear_env_cache()
    before = jax.config.jax_compilation_cache_dir
    c.maybe_enable_compile_cache()      # unset -> no change
    assert jax.config.jax_compilation_cache_dir == before

    monkeypatch.setenv("MWX_COMPILE_CACHE_DIR", str(tmp_path))
    c.clear_env_cache()
    c.maybe_enable_compile_cache()
    assert jax.config.jax_compilation_cache_dir == str(tmp_path)
    monkeypatch.delenv("MWX_COMPILE_CACHE_DIR")
    c.clear_env_cache()
