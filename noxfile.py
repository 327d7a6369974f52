"""Nox sessions (counterpart of the reference's noxfile.py/tox.ini)."""

import nox


@nox.session
def test(session):
    session.install("-e", ".")
    session.install("pytest")
    session.run("make", "-C", "csrc", external=True)
    session.run("python", "-m", "pytest", "tests/", "-q")


@nox.session
def lint(session):
    session.install("ruff")
    session.run("ruff", "check", "audiodeepfake_detection_tpu", "tests")
