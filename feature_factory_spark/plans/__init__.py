from .inspect import explain_str, plan_audit, plan_report
