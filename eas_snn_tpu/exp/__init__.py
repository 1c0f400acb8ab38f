from .base_exp import BaseExp
from .build import get_exp, get_exp_by_file, get_exp_by_name
from .event_exp import EventExp
