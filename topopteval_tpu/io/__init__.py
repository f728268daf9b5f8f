from .vtu import (VTUFile, VTUWriter, read_vtu_mesh, read_cell_density,
                  write_vtu)

__all__ = ["VTUFile", "VTUWriter", "read_vtu_mesh", "read_cell_density",
           "write_vtu"]
