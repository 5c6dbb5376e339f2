from .apgd import apgd_attack, apgd_ce, apgd_targeted
from .autoattack import AutoAttackSuite
from .fab import fab_targeted
from .pgd import pgd_attack
from .square import square_attack
