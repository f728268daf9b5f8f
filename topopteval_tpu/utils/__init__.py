from .terminal import (print_info, print_error, print_warning, print_success,
                       print_data, set_verbosity, verbosity, log)

__all__ = ["print_info", "print_error", "print_warning", "print_success",
           "print_data", "set_verbosity", "verbosity", "log"]
