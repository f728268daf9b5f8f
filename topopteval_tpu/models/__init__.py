from .beams import generate_grid_hex, generate_grid_tet, refined_beam

__all__ = ["generate_grid_hex", "generate_grid_tet", "refined_beam",
           "cantilever_beam", "cantilever_under_gravity",
           "cube_under_gravity", "simp_beam"]


def __getattr__(name):
    # problems.py pulls in the api layer; import lazily to keep
    # fem.multigrid -> models.beams free of the api->fem cycle
    if name in ("cantilever_beam", "cantilever_under_gravity",
                "cube_under_gravity", "simp_beam"):
        from . import problems
        return getattr(problems, name)
    raise AttributeError(name)
