-- bug class: all-nil multi-value returns (late round 3) — a masked
-- `return nil, nil` (debug.lua's col/row helpers) marks the lanes nil
-- for EVERY slot, exactly like `return nil`; callers destructuring two
-- values see per-lane nil in both.
function cell(x)
  if x < 0 then
    return nil, nil
  end
  local i = math.floor(x)
  return i, x - i
end
function f(x, y)
  local i, frac = cell(x + y)
  if i == nil then
    return -1, -1
  end
  return i + frac, frac * y
end
