-- bug class: data-dependent break freezing exited lanes (round 2) —
-- lanes that break out of a loop must keep their exit-time values
-- while remaining lanes keep iterating (repeat_until-style masking).
function f(x, y)
  local v = x
  local n = 0
  for i = 1, 6 do
    v = v * 0.5 + y * 0.1
    n = n + 1
    if v < 0.3 then break end
  end
  return v, n
end
