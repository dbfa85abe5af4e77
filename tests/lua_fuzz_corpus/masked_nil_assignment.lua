-- bug class: masked nil assignment (round-2 fix f517e4e) — assigning
-- nil under a lane mask must make those LANES nil (per-lane _MaybeNil),
-- not collapse the variable into a dtype=object array.
function h(a, b)
  local v = a * 0.5 + b
  if v > 0.2 then v = nil end
  if v == nil then v = -1.5 end
  return (v + b) * 0.5
end
function f(x, y)
  local hh = h(x, y)
  local g0 = y
  if x < 0 then g0 = nil end
  if g0 == nil then g0 = 0.25 end
  return hh + g0, g0 * x
end
